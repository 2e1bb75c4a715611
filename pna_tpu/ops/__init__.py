from pna_tpu.ops.aggregators import DENSE_AGGREGATORS, SEGMENT_AGGREGATORS, SegmentCtx
from pna_tpu.ops.scalers import DENSE_SCALERS, SCALERS

__all__ = ["DENSE_AGGREGATORS", "SEGMENT_AGGREGATORS", "SegmentCtx",
           "DENSE_SCALERS", "SCALERS"]
