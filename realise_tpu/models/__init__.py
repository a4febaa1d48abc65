from realise_tpu.models.realise import (  # noqa: F401
    apply_pretrain,
    apply_realise,
    init_pretrain,
    init_realise,
    masked_cross_entropy,
    precompute_inference_tables,
    tie_cls_weight_noop,
)
