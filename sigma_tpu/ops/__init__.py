from sigma_tpu.ops.selective_scan import (
    selective_scan,
    selective_scan_cl,
    selective_scan_ref,
    selective_scan_xla,
)
from sigma_tpu.ops.scan_layout import (
    cross_scan,
    cross_merge,
    cross_scan_multimodal,
    cross_merge_multimodal,
)

__all__ = [
    "selective_scan",
    "selective_scan_cl",
    "selective_scan_ref",
    "selective_scan_xla",
    "cross_scan",
    "cross_merge",
    "cross_scan_multimodal",
    "cross_merge_multimodal",
]
