from tron_tpu.utils.xfer import to_device, to_host

__all__ = ["to_device", "to_host"]
