from realise_tpu.parallel.mesh import (  # noqa: F401
    batch_shardings,
    make_mesh,
    param_shardings,
    replicated,
)
