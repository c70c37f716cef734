from radar_tpu.ops.decode import decode_to_cube, rx0_slice
from radar_tpu.ops.preproc import clutter_subtract_pad
from radar_tpu.ops.rangefft import range_fft, range_doppler
from radar_tpu.ops.detect import (
    peak_detect,
    distance_from_bin,
    scan_window_argmax,
)
from radar_tpu.ops.cfar import ca_cfar_2d
from radar_tpu.ops.cluster import (
    ClusterResult,
    cluster_detections,
    label_hits,
    representatives,
)
from radar_tpu.ops.aoa import (
    angle_fft_spectrum,
    capon_spectrum,
    music_spectrum,
    angle_bins_deg,
    range_azimuth_capon_from_shorts,
    angle_doppler_from_shorts,
    range_azimuth_from_shorts,
)
from radar_tpu.ops.mdoppler import (
    auto_range_bin,
    micro_doppler_spectrogram,
)
from radar_tpu.ops.interference import blank_interference
from radar_tpu.ops.keystone import keystone_cube, keystone_matrices
from radar_tpu.ops.egomotion import (
    EgoMotion,
    ego_compensated_velocity,
    estimate_ego_motion,
    estimate_ego_motion_yaw,
    mount_rotation,
)

__all__ = [
    "decode_to_cube",
    "rx0_slice",
    "clutter_subtract_pad",
    "range_fft",
    "range_doppler",
    "peak_detect",
    "distance_from_bin",
    "scan_window_argmax",
    "ca_cfar_2d",
    "keystone_cube",
    "keystone_matrices",
    "EgoMotion",
    "estimate_ego_motion",
    "estimate_ego_motion_yaw",
    "mount_rotation",
    "ego_compensated_velocity",
    "ClusterResult",
    "cluster_detections",
    "representatives",
    "label_hits",
    "angle_fft_spectrum",
    "capon_spectrum",
    "music_spectrum",
    "angle_bins_deg",
    "range_azimuth_from_shorts",
    "range_azimuth_capon_from_shorts",
    "auto_range_bin",
    "micro_doppler_spectrogram",
    "blank_interference",
]
