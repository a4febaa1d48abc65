from realise_tpu.data.features import (  # noqa: F401
    Featurizer,
    make_example,
)
from realise_tpu.data.dataset import (  # noqa: F401
    batch_iterator,
    load_pkl_dataset,
    save_pkl_dataset,
    synthetic_dataset,
)
