from layoutdm_tpu.data.datasets import LayoutData, load_dataset  # noqa: F401
from layoutdm_tpu.data.loader import batch_iterator  # noqa: F401
