from echr_tpu.data.labels import (  # noqa: F401
    anchor_mask,
    featstamp_to_time,
    flatten_good_proposals,
    iou_grid,
    sample_proposals,
    timestamp_to_featstamp,
)
