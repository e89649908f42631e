from layoutdm_tpu.tokenizer.bbox import BboxTokenizer  # noqa: F401
from layoutdm_tpu.tokenizer.converter import Converter  # noqa: F401
from layoutdm_tpu.tokenizer.sequence import LayoutSequenceTokenizer  # noqa: F401
