from radar_tpu.parallel.mesh import build_mesh, mesh_factorization
from radar_tpu.parallel.distributed import DistributedRDPipeline
from radar_tpu.parallel.stream import FrameStreamer, stream_detect

__all__ = [
    "build_mesh",
    "mesh_factorization",
    "DistributedRDPipeline",
    "FrameStreamer",
    "stream_detect",
]
