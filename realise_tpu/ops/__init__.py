from realise_tpu.ops import bert, fusion, gru, layers, resnet  # noqa: F401
