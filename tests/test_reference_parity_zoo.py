"""Baseline-zoo parity against the REFERENCE'S OWN model code.

Round-2 VERDICT item 5: MaskGIT/BLT/BART were twin-tested only.  This file
imports the reference's own `models/{maskgit,blt,bart}.py` (via ref_shim),
ports their random-init torch weights into our flax models, and asserts:

  (a) `mask_schedule_func` golden-equal for all 7 schedules
      (`maskgit.py:33-71`)
  (b) a full MaskGIT deterministic decode (T steps, incl. PAD suppression,
      confidence re-masking, user forcing) token-identical for both the
      element-count-known ("c") and unknown ("partial") branches
      (`maskgit.py:150-253`)
  (c) a full BLT deterministic grouped decode (3 stages x T/3) token-
      identical (`blt.py:98-190`)
  (d) a full BART greedy decode token-identical — legality masks, the
      alphabetical order constraint, and conditional forcing
      (`bart.py:103-213`) — via a full enc-dec weight port
  (e) get_cond parity for the BOS tokenizer variants BART consumes

Deterministic sampling makes the decodes noise-free, so equality is exact
over every step — strictly stronger than a one-step shared-noise check.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from layoutdm_tpu import tasks as my_tasks
from layoutdm_tpu.configs import BackboneConfig, SamplingConfig
from layoutdm_tpu.models.bart import BART as MyBART
from layoutdm_tpu.models.blt import BLT as MyBLT
from layoutdm_tpu.models.autoreg import ElemWiseAutoreg as MyAutoreg
from layoutdm_tpu.models.maskgit import MaskGIT as MyMaskGIT, mask_schedule
from layoutdm_tpu.models.ruite import RUITE as MyRUITE
from layoutdm_tpu.registry import DATASET_LABELS
from layoutdm_tpu.tokenizer.bbox import BboxTokenizer
from layoutdm_tpu.tokenizer.sequence import LayoutSequenceTokenizer
from layoutdm_tpu.utils.torch_port import (
    convert_categorical_encdec_transformer,
    convert_categorical_transformer,
)

from tests import ref_shim

ref_shim.install_stubs()

import trainer.models.bart as ref_bart_mod  # noqa: E402
import trainer.models.blt as ref_blt_mod  # noqa: E402
import trainer.models.elem_wise_autoreg as ref_autoreg_mod  # noqa: E402
import trainer.models.maskgit as ref_maskgit_mod  # noqa: E402
import trainer.models.ruite as ref_ruite_mod  # noqa: E402


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def make_plain_backbone_cfg(d_model=64, nhead=4, dim_feedforward=128,
                            num_layers=2):
    """Backbone cfg WITHOUT diffusion keys — BART feeds encoder_layer params
    straight into torch's TransformerDecoderLayer (`bart.py:66-74`)."""
    return ref_shim.AttrDict(
        _target_="trainer.models.transformer_utils.TransformerEncoder",
        encoder_layer=ref_shim.AttrDict(
            _target_="trainer.models.transformer_utils.Block",
            d_model=d_model,
            nhead=nhead,
            dim_feedforward=dim_feedforward,
            dropout=0.0,
            batch_first=True,
            norm_first=True,
        ),
        num_layers=num_layers,
    )


def my_flagship_tokenizer():
    bb = BboxTokenizer(num_bins=32, var_order=("x", "y", "w", "h"),
                       shared_vocab="x-y-w-h")
    return LayoutSequenceTokenizer(
        bbox_tokenizer=bb,
        num_categories=len(DATASET_LABELS["rico25"]),
        max_elements=25,
        special_tokens=("pad", "mask"),
        pad_until_max=True,
    )


def _random_layouts(rng, B=4, S=25, n_cat=25, n_min=2):
    n = rng.randint(n_min, S + 1, size=(B,))
    mask = np.arange(S)[None, :] < n[:, None]
    label = (rng.randint(0, n_cat, size=(B, S)) * mask).astype(np.int64)
    bbox = rng.rand(B, S, 4).astype(np.float32) * mask[..., None]
    return label, bbox, mask


def _cond_pair(rng, ref_tok, my_tok, cond_type, **layout_kw):
    """(ref torch cond dict, our cond dict) on identical batches — only for
    cond types whose get_cond is deterministic given the batch."""
    label, bbox, mask = _random_layouts(rng, **layout_kw)
    my_cond = my_tasks.get_cond(
        jax.random.PRNGKey(0),
        {"label": label, "bbox": bbox, "mask": mask},
        my_tok,
        cond_type,
    )
    ref_cond = {
        "seq": torch.from_numpy(np.asarray(my_cond["seq"], np.int64)),
        "mask": torch.from_numpy(np.asarray(my_cond["mask"])),
        "type": cond_type,
    }
    return ref_cond, my_cond


DET = ref_shim.AttrDict(name="deterministic", temperature=1.0)


# ---------------------------------------------------------------------------
# (a) schedule golden
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "schedule", ["linear", "cosine", "square", "cubic", "sqrt", "log", "exp"]
)
def test_mask_schedule_parity(schedule):
    ratio = np.linspace(0.01, 1.0, 37, dtype=np.float32)
    ref = ref_maskgit_mod.mask_schedule_func(
        torch.from_numpy(ratio), schedule=schedule, total_unknown=125
    ).numpy()
    my = np.asarray(mask_schedule(jnp.asarray(ratio), schedule,
                                  total_unknown=125))
    np.testing.assert_allclose(my, ref, atol=1e-6)


# ---------------------------------------------------------------------------
# (b) MaskGIT full deterministic decode
# ---------------------------------------------------------------------------


def _build_maskgit_pair():
    torch.manual_seed(7)
    ref_tok = ref_shim.make_ref_tokenizer()
    ref_m = ref_maskgit_mod.MaskGIT(
        backbone_cfg=make_plain_backbone_cfg(),
        tokenizer=ref_tok,
        use_gumbel_noise=False,
    ).eval()
    # capture raw token ids instead of decoded layouts
    ref_m.tokenizer.decode = lambda seq: seq

    my_tok = my_flagship_tokenizer()
    my_m = MyMaskGIT(
        BackboneConfig(d_model=64, nhead=4, dim_feedforward=128,
                       num_layers=2, dropout=0.0),
        my_tok,
        use_gumbel_noise=False,
    )
    params = convert_categorical_transformer(
        ref_m.state_dict(), num_layers=2, timestep_type=None,
        prefix="model.module.",
    )
    return ref_m, my_m, my_tok, params


@pytest.mark.parametrize("cond_type", ["c", "partial"])
def test_maskgit_decode_parity(rng, cond_type):
    ref_m, my_m, my_tok, params = _build_maskgit_pair()
    ref_tok = ref_m.tokenizer

    if cond_type == "partial":
        # partial involves randomness in get_cond; build it once on our side
        # with a fixed key and hand the identical cond to the reference
        my_cond = my_tasks.get_cond(
            jax.random.PRNGKey(3),
            dict(zip(("label", "bbox", "mask"), _random_layouts(rng))),
            my_tok,
            "partial",
        )
        ref_cond = {
            "seq": torch.from_numpy(np.asarray(my_cond["seq"], np.int64)),
            "mask": torch.from_numpy(np.asarray(my_cond["mask"])),
            "type": "partial",
        }
    else:
        ref_cond, my_cond = _cond_pair(rng, ref_tok, my_tok, cond_type)

    T = 4
    with torch.no_grad():
        ref_ids = ref_m.sample(
            batch_size=ref_cond["seq"].shape[0],
            cond=ref_cond,
            sampling_cfg=ref_shim.AttrDict(
                name="deterministic", temperature=1.0, num_timesteps=T
            ),
        ).numpy()

    sc = my_tasks.to_sampler_cond(my_cond, my_tok, SamplingConfig())
    my_ids = np.asarray(
        my_m.sample_ids(
            params,
            jax.random.PRNGKey(0),
            batch_size=ref_cond["seq"].shape[0],
            cond=sc,
            sampling=SamplingConfig(name="deterministic", num_timesteps=T),
        )
    )
    np.testing.assert_array_equal(my_ids, ref_ids)


# ---------------------------------------------------------------------------
# (c) BLT full deterministic grouped decode
# ---------------------------------------------------------------------------


def test_blt_decode_parity(rng):
    torch.manual_seed(11)
    ref_tok = ref_shim.make_ref_tokenizer()
    ref_m = ref_blt_mod.BLT(
        backbone_cfg=make_plain_backbone_cfg(),
        tokenizer=ref_tok,
    ).eval()
    ref_m.tokenizer.decode = lambda seq: seq

    my_tok = my_flagship_tokenizer()
    my_m = MyBLT(
        BackboneConfig(d_model=64, nhead=4, dim_feedforward=128,
                       num_layers=2, dropout=0.0),
        my_tok,
    )
    params = convert_categorical_transformer(
        ref_m.state_dict(), num_layers=2, timestep_type=None,
        prefix="model.module.",
    )

    ref_cond, my_cond = _cond_pair(rng, ref_tok, my_tok, "c")
    T = 6
    with torch.no_grad():
        ref_ids = ref_m.sample(
            batch_size=ref_cond["seq"].shape[0],
            cond=ref_cond,
            sampling_cfg=ref_shim.AttrDict(
                name="deterministic", temperature=1.0, num_timesteps=T
            ),
        ).numpy()

    sc = my_tasks.to_sampler_cond(my_cond, my_tok, SamplingConfig())
    my_ids = np.asarray(
        my_m.sample_ids(
            params,
            jax.random.PRNGKey(0),
            batch_size=ref_cond["seq"].shape[0],
            cond=sc,
            sampling=SamplingConfig(name="deterministic", num_timesteps=T),
        )
    )
    np.testing.assert_array_equal(my_ids, ref_ids)


# ---------------------------------------------------------------------------
# (d) BART greedy decode — legality + alphabetical constraint + forcing
# ---------------------------------------------------------------------------


def _build_bart_pair(sort_by):
    torch.manual_seed(13)
    ref_tok = ref_shim.make_ref_tokenizer(
        max_seq_length=4,
        var_order="c-w-h-x-y",
        special_tokens=("pad", "bos", "eos", "mask"),
    )
    ref_m = ref_bart_mod.BART(
        backbone_cfg=make_plain_backbone_cfg(
            d_model=128, nhead=4, dim_feedforward=64, num_layers=1
        ),
        tokenizer=ref_tok,
        sort_by=sort_by,
        tasks=["random"],
        pos_emb="default",
    ).eval()
    ref_m.tokenizer.decode = lambda seq: seq

    bb = BboxTokenizer(num_bins=32, var_order=("w", "h", "x", "y"),
                       shared_vocab="x-y-w-h")
    my_tok = LayoutSequenceTokenizer(
        bbox_tokenizer=bb, num_categories=len(DATASET_LABELS["rico25"]),
        max_elements=4,
        special_tokens=("pad", "bos", "eos", "mask"), pad_until_max=True,
    )
    my_m = MyBART(
        BackboneConfig(d_model=128, nhead=4, dim_feedforward=64,
                       num_layers=1, dropout=0.0),
        my_tok,
        sort_by=sort_by if sort_by != "none" else None,
    )
    params = convert_categorical_encdec_transformer(
        ref_m.state_dict(),
        num_layers=1,
        d_model=int(128 * 21 / 32),
        prefix="model.module.",
    )
    return ref_m, my_m, my_tok, params


@pytest.mark.parametrize("sort_by", ["none", "category_alphabetical"])
def test_bart_decode_parity(rng, sort_by):
    ref_m, my_m, my_tok, params = _build_bart_pair(sort_by)

    label, bbox, mask = _random_layouts(rng, B=3, S=4, n_cat=25)
    my_cond = my_tasks.get_cond(
        jax.random.PRNGKey(0),
        {"label": label, "bbox": bbox, "mask": mask},
        my_m.tokenizer,  # carries sort_by so encode ordering matches
        "c",
    )
    ref_cond = {
        "seq": torch.from_numpy(np.asarray(my_cond["seq"], np.int64)),
        "mask": torch.from_numpy(np.asarray(my_cond["mask"])),
        "type": "c",
    }
    with torch.no_grad():
        ref_ids = ref_m.sample(
            batch_size=3, cond=ref_cond, sampling_cfg=DET, cond_type="c"
        ).numpy()

    sc = my_tasks.to_sampler_cond(my_cond, my_m.tokenizer, SamplingConfig())
    my_ids = np.asarray(
        my_m.sample_ids(
            params, jax.random.PRNGKey(0), 3, cond=sc,
            sampling=SamplingConfig(name="deterministic"),
        )
    )
    np.testing.assert_array_equal(my_ids, ref_ids)


# ---------------------------------------------------------------------------
# (e) get_cond parity for BOS tokenizers (consumed by BART / AR models)
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# (f) ElemWiseAutoreg (LayoutTransformer) full causal decode
# ---------------------------------------------------------------------------


def _my_bos_tokenizer(max_elements=4):
    bb = BboxTokenizer(num_bins=32, var_order=("x", "y", "w", "h"),
                       shared_vocab="x-y-w-h")
    return LayoutSequenceTokenizer(
        bbox_tokenizer=bb, num_categories=len(DATASET_LABELS["rico25"]),
        max_elements=max_elements,
        special_tokens=("pad", "bos", "eos", "mask"), pad_until_max=True,
    )


def _build_autoreg_pair():
    torch.manual_seed(17)
    ref_tok = ref_shim.make_ref_tokenizer(
        max_seq_length=4,
        special_tokens=("pad", "bos", "eos", "mask"),
    )
    ref_m = ref_autoreg_mod.ElemWiseAutoreg(
        backbone_cfg=make_plain_backbone_cfg(),
        tokenizer=ref_tok,
        pos_emb="default",
    ).eval()
    ref_m.tokenizer.decode = lambda seq: seq

    my_tok = _my_bos_tokenizer()
    my_m = MyAutoreg(
        BackboneConfig(d_model=64, nhead=4, dim_feedforward=128,
                       num_layers=2, dropout=0.0),
        my_tok,
    )
    params = convert_categorical_transformer(
        ref_m.state_dict(), num_layers=2, timestep_type=None,
        prefix="model.module.",
    )
    return ref_m, my_m, my_tok, params


@pytest.mark.parametrize("cond_type", [None, "c"])
def test_autoreg_decode_parity(rng, cond_type):
    """Full token-by-token causal decode vs `elem_wise_autoreg.py:74-138`:
    per-slot legality masks, conditional forcing, and (for the KV-cached
    path) the cache formulation — all token-identical under deterministic
    sampling."""
    ref_m, my_m, my_tok, params = _build_autoreg_pair()
    B = 3
    if cond_type is None:
        ref_cond, sc = None, None
    else:
        label, bbox, mask = _random_layouts(rng, B=B, S=4)
        my_cond = my_tasks.get_cond(
            jax.random.PRNGKey(0),
            {"label": label, "bbox": bbox, "mask": mask},
            my_tok, cond_type, model_type="ElemWiseAutoreg",
        )
        ref_cond = {
            "seq": torch.from_numpy(np.asarray(my_cond["seq"], np.int64)),
            "mask": torch.from_numpy(np.asarray(my_cond["mask"])),
            "type": cond_type,
        }
        sc = my_tasks.to_sampler_cond(my_cond, my_tok, SamplingConfig())

    with torch.no_grad():
        ref_ids = ref_m.sample(
            batch_size=B, cond=ref_cond, sampling_cfg=DET
        ).numpy()

    for use_cache in (True, False):
        my_ids = np.asarray(
            my_m.sample_ids(
                params, jax.random.PRNGKey(0), B, cond=sc,
                sampling=SamplingConfig(name="deterministic"),
                use_cache=use_cache,
            )
        )
        np.testing.assert_array_equal(my_ids, ref_ids)


def test_autoreg_refinement_decode_parity(rng):
    """Refinement decode vs the reference: the weak smoothed-onehot prior is
    added at each causal step with the BOS column shift
    (`elem_wise_autoreg.py:117-120`)."""
    ref_m, my_m, my_tok, params = _build_autoreg_pair()
    B = 3
    label, bbox, mask = _random_layouts(rng, B=B, S=4)
    my_cond = my_tasks.get_cond(
        jax.random.PRNGKey(1),
        {"label": label, "bbox": bbox, "mask": mask},
        my_tok, "refinement", model_type="ElemWiseAutoreg",
    )
    ref_cond = {
        "seq": torch.from_numpy(np.asarray(my_cond["seq"], np.int64)),
        "mask": torch.from_numpy(np.asarray(my_cond["mask"])),
        "seq_orig": torch.from_numpy(
            np.asarray(my_cond["seq_orig"], np.int64)
        ),
        "type": "refinement",
    }
    ref_sampling = ref_shim.AttrDict(
        name="deterministic", temperature=1.0,
        refine_lambda=4.0, refine_mode="uniform", refine_offset_ratio=0.2,
    )
    with torch.no_grad():
        ref_ids = ref_m.sample(
            batch_size=B, cond=ref_cond, sampling_cfg=ref_sampling
        ).numpy()

    my_sampling = SamplingConfig(
        name="deterministic", refine_lambda=4.0, refine_mode="uniform",
        refine_offset_ratio=0.2,
    )
    sc = my_tasks.to_sampler_cond(my_cond, my_tok, my_sampling)
    my_ids = np.asarray(
        my_m.sample_ids(
            params, jax.random.PRNGKey(0), B, cond=sc, sampling=my_sampling
        )
    )
    np.testing.assert_array_equal(my_ids, ref_ids)


# ---------------------------------------------------------------------------
# (g) RUITE one-shot refinement
# ---------------------------------------------------------------------------


def test_ruite_sample_parity(rng):
    """One-shot denoise + known-token replacement vs `ruite.py:68-100` —
    padding-mask construction, deterministic sampling, and the
    cond-replacement scatter."""
    torch.manual_seed(19)
    ref_tok = ref_shim.make_ref_tokenizer(max_seq_length=6)
    ref_m = ref_ruite_mod.RUITE(
        backbone_cfg=make_plain_backbone_cfg(), tokenizer=ref_tok
    ).eval()
    ref_m.tokenizer.decode = lambda seq: seq

    bb = BboxTokenizer(num_bins=32, var_order=("x", "y", "w", "h"),
                       shared_vocab="x-y-w-h")
    my_tok = LayoutSequenceTokenizer(
        bbox_tokenizer=bb, num_categories=len(DATASET_LABELS["rico25"]),
        max_elements=6, special_tokens=("pad", "mask"), pad_until_max=True,
    )
    my_m = MyRUITE(
        BackboneConfig(d_model=64, nhead=4, dim_feedforward=128,
                       num_layers=2, dropout=0.0),
        my_tok,
    )
    params = convert_categorical_transformer(
        ref_m.state_dict(), num_layers=2, timestep_type=None,
        prefix="model.module.",
    )

    B = 4
    label, bbox, mask = _random_layouts(rng, B=B, S=6)
    my_cond = my_tasks.get_cond(
        jax.random.PRNGKey(2),
        {"label": label, "bbox": bbox, "mask": mask},
        my_tok, "refinement", model_type="RUITE",
    )
    ref_cond = {
        "seq": torch.from_numpy(np.asarray(my_cond["seq"], np.int64)),
        "mask": torch.from_numpy(np.asarray(my_cond["mask"])),
        "type": "refinement",
    }
    with torch.no_grad():
        ref_ids = ref_m.sample(
            batch_size=B, cond=ref_cond, sampling_cfg=DET
        ).numpy()

    sc = my_tasks.to_sampler_cond(my_cond, my_tok, SamplingConfig())
    my_ids = np.asarray(
        my_m.sample_ids(
            params, jax.random.PRNGKey(0), B, cond=sc,
            sampling=SamplingConfig(name="deterministic"),
        )
    )
    np.testing.assert_array_equal(my_ids, ref_ids)


@pytest.mark.parametrize("cond_type", ["c", "cwh", "gt"])
def test_get_cond_bos_tokenizer_parity(rng, cond_type):
    ref_tok = ref_shim.make_ref_tokenizer(
        max_seq_length=8,
        var_order="c-w-h-x-y",
        special_tokens=("pad", "bos", "eos", "mask"),
    )
    bb = BboxTokenizer(num_bins=32, var_order=("w", "h", "x", "y"),
                       shared_vocab="x-y-w-h")
    my_tok = LayoutSequenceTokenizer(
        bbox_tokenizer=bb, num_categories=len(DATASET_LABELS["rico25"]),
        max_elements=8,
        special_tokens=("pad", "bos", "eos", "mask"), pad_until_max=True,
    )
    label, bbox, mask = _random_layouts(rng, B=5, S=8, n_cat=25)
    batch = ref_shim.dense_to_sparse_batch(label, bbox, mask)
    import trainer.helpers.task as ref_task

    ref = ref_task.get_cond(batch, ref_tok, cond_type)
    my = my_tasks.get_cond(
        jax.random.PRNGKey(0),
        {"label": label, "bbox": bbox, "mask": mask},
        my_tok,
        cond_type,
    )
    np.testing.assert_array_equal(np.asarray(my["seq"]), ref["seq"].numpy())
    np.testing.assert_array_equal(np.asarray(my["mask"]), ref["mask"].numpy())
