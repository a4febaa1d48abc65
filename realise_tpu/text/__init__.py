from realise_tpu.text.tokenizer import WordPieceTokenizer, is_chinese_char  # noqa: F401
from realise_tpu.text.pinyin import Pinyin1Convertor, Pinyin2Convertor  # noqa: F401
