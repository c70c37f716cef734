from radar_tpu.ops.pallas.cfar_kernel import ca_cfar_2d_pallas
from radar_tpu.ops.pallas.magargmax import masked_argmax_pallas

__all__ = ["ca_cfar_2d_pallas", "masked_argmax_pallas"]
