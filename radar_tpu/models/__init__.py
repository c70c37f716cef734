from radar_tpu.models.range_detector import RangeDetector
from radar_tpu.models.rd_pipeline import RDPipeline, RDResult

__all__ = ["RangeDetector", "RDPipeline", "RDResult"]
