from radar_tpu.utils.timing import Timer, StageTimings, time_fn
from radar_tpu.utils.records import DetectionRecord, JsonlWriter

__all__ = ["Timer", "StageTimings", "time_fn", "DetectionRecord", "JsonlWriter"]
