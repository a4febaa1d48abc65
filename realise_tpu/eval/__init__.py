from realise_tpu.eval.metric_core import (  # noqa: F401
    metric_file,
    parse_label_line,
    read_label_file,
    sent_metric_correct,
    sent_metric_detect,
)
from realise_tpu.eval.metric import Metric  # noqa: F401
from realise_tpu.eval.remove_de import remove_de, remove_de_text  # noqa: F401
