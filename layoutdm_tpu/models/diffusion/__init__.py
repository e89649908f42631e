from layoutdm_tpu.models.diffusion.constrained import ConstrainedQ  # noqa: F401
from layoutdm_tpu.models.diffusion.vanilla import VanillaQ  # noqa: F401
