from tron_tpu.oracle.dtft import dtft2, dtft2_adjoint, dtft2_adjoint_chunked

__all__ = ["dtft2", "dtft2_adjoint", "dtft2_adjoint_chunked"]
