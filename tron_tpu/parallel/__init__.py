from tron_tpu.parallel import distributed
from tron_tpu.parallel.mesh import make_mesh, recon_frames_sharded

__all__ = ["make_mesh", "recon_frames_sharded", "distributed"]
