from realise_tpu.utils.profiler import StepTimer, trace  # noqa: F401
