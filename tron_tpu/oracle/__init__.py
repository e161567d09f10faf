from tron_tpu.oracle.dtft import dtft2, dtft2_adjoint

__all__ = ["dtft2", "dtft2_adjoint"]
