"""layoutdm_tpu — a TPU-native JAX framework for discrete layout diffusion.

A from-scratch re-design of the capabilities of CyberAgentAILab/layout-dm
(LayoutDM, CVPR 2023) around three compiled XLA programs:

* ``train_step``   — pure function, data-parallel over an ICI mesh.
* ``sample_chain`` — the full T-step reverse diffusion as one ``lax.scan``;
  all six conditional tasks (unconditional / c / cwh / partial / refinement /
  relation) are branch-free logit manipulations inside the scan.
* ``extract_features`` — FIDNetV3 feature extraction for on-TPU eval.

See SURVEY.md at the repo root for the structural map of the reference this
framework is built to match (with file:line citations).
"""

__version__ = "0.1.0"

from layoutdm_tpu.registry import DATASET_LABELS  # noqa: F401
