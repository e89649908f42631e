"""Relation constraints: detector/loss consistency + guided sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from layoutdm_tpu.configs import SamplingConfig
from layoutdm_tpu.data.relations import (
    RelLoc,
    RelSize,
    detect_loc_relation,
    detect_size_relation,
    pad_edges,
    sample_relations,
)
from layoutdm_tpu.data.transforms import compose_transform
from layoutdm_tpu.relation.const import relation_losses
from layoutdm_tpu.relation.guidance import (
    RelationData,
    expected_bbox,
    make_relation_guidance,
)
from layoutdm_tpu.tasks import get_cond, to_sampler_cond
from tests.test_model import tiny_model
from tests.test_tokenizer import random_layout


def test_detectors():
    a = np.array([0.3, 0.2, 0.2, 0.2])
    b = np.array([0.3, 0.6, 0.4, 0.4])
    assert detect_size_relation(a, b) == RelSize.LARGER
    assert detect_size_relation(b, a) == RelSize.SMALLER
    assert detect_size_relation(a, a) == RelSize.EQUAL
    assert detect_loc_relation(a, b) == RelLoc.BOTTOM
    assert detect_loc_relation(b, a) == RelLoc.TOP
    canvas_b = np.array([0.5, 0.2, 1, 1])
    assert detect_loc_relation(None, canvas_b, is_canvas=True) == RelLoc.TOP


def test_sample_relations_consistent_with_detectors(rng):
    bbox = rng.rand(6, 4).astype(np.float32)
    bbox[:, 2:] = bbox[:, 2:] * 0.3 + 0.05
    label = np.arange(6)
    ei, ea = sample_relations(bbox, label, edge_ratio=1.0, seed=0,
                              has_canvas=False)
    assert len(ea) == 15  # all pairs get both slots at ratio 1.0
    for (i, j), attr in zip(ei, ea):
        assert attr & (1 << detect_size_relation(bbox[i], bbox[j]))
        assert attr & (1 << detect_loc_relation(bbox[i], bbox[j]))


def test_relation_losses_zero_for_satisfied(rng):
    """A layout's own detected relations must incur ~zero penalty."""
    bbox = np.array(
        [
            [0.5, 0.5, 1.0, 1.0],  # canvas
            [0.5, 0.2, 0.8, 0.2],
            [0.5, 0.7, 0.4, 0.3],
        ],
        np.float32,
    )
    label = np.array([0, 1, 2])
    ei, ea = sample_relations(bbox, label, edge_ratio=1.0, seed=1,
                              has_canvas=True)
    p = pad_edges(ei, ea, 16)
    losses = relation_losses(
        jnp.asarray(bbox[None]),
        jnp.asarray(p["edge_index"][None]),
        jnp.asarray(p["edge_attr"][None]),
        jnp.asarray(p["edge_mask"][None]),
        jnp.asarray((label[p["edge_index"][:, 0]] == 0)[None]),
    )
    # hinge penalties: satisfied strict relations may carry eps-level slack
    assert float(jnp.abs(losses).sum()) < 1e-4


def test_relation_losses_positive_for_violated():
    # edge (src=1, dst=2) with LEFT: dst must be left of src — but it's right
    bbox = np.array(
        [[0.5, 0.5, 1, 1], [0.2, 0.5, 0.2, 0.2], [0.8, 0.5, 0.2, 0.2]],
        np.float32,
    )
    label = np.array([0, 1, 2])
    ei = np.array([[1, 2]], np.int32)
    ea = np.array([(1 << RelSize.UNKNOWN) | (1 << RelLoc.LEFT)], np.int32)
    p = pad_edges(ei, ea, 8)
    losses = relation_losses(
        jnp.asarray(bbox[None]),
        jnp.asarray(p["edge_index"][None]),
        jnp.asarray(p["edge_attr"][None]),
        jnp.asarray(p["edge_mask"][None]),
        jnp.zeros((1, 8), bool),
    )
    assert float(losses.sum()) > 0.1


def test_expected_bbox_differentiable(rng):
    model = tiny_model()
    tok = model.tokenizer
    B, S = 2, tok.max_elements
    log_prob = jnp.asarray(
        rng.randn(B, tok.max_token_length, tok.N_total), jnp.float32
    )
    mask = jnp.ones((B, S), bool)

    def f(lp):
        return expected_bbox(lp, tok, mask).sum()

    g = jax.grad(f)(log_prob)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_relation_guided_sampling(rng):
    """Full relation task: transforms -> cond -> guided compiled sampling."""
    model = tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    tok = model.tokenizer

    layout = random_layout(rng, B=2, S=3, n_cat=3)
    layout["mask"][:] = np.array([[True, True, True], [True, True, False]])
    # canvas-augmented graph for edges (reference test.py:152-158)
    transform = compose_transform(
        ["AddCanvasElement", "AddRelationConstraints(edge_ratio=0.5, seed=0, max_edges=8)"]
    )
    batch_w_canvas = transform(rng, dict(layout))
    rel = RelationData.from_batch(batch_w_canvas)

    # cond on the canvas-free layout, padded to the model's max_elements
    S = tok.max_elements
    pad = lambda a, w: np.pad(a, ((0, 0), (0, S - a.shape[1])) + ((0, 0),) * (a.ndim - 2))
    batch = {k: pad(np.asarray(layout[k]), S) for k in ("bbox", "label", "mask")}
    cond = get_cond(jax.random.PRNGKey(1), batch, tok, "relation")
    sc = to_sampler_cond(cond, tok, SamplingConfig())

    guidance = make_relation_guidance(
        tok, SamplingConfig(relation_num_update=2, relation_lambda=1.0), rel
    )
    ids = model.sample_ids(
        params, jax.random.PRNGKey(2), batch_size=2, cond=sc,
        guidance_fn=guidance,
    )
    ids = np.asarray(ids).reshape(2, -1, 5)
    # categories preserved
    for b in range(2):
        for s in range(3):
            if layout["mask"][b, s]:
                assert ids[b, s, 0] == layout["label"][b, s]


def test_guidance_gate_and_effect(rng):
    """Relation guidance modifies logits only for t >= 10
    (`logit_adjustment.py:107`) and, at the reference's lambda scale,
    changes the sampled output."""
    import jax.numpy as jnp

    from layoutdm_tpu.configs import BackboneConfig, ModelConfig
    from layoutdm_tpu.models.layoutdm import LayoutDM
    from tests.test_tokenizer import make_tokenizer

    T = 16
    tok = make_tokenizer(shared_vocab="x-y-w-h", num_categories=3,
                         max_elements=3)
    layout = random_layout(rng, B=4, S=3, n_cat=3)
    layout["mask"][:] = True
    transform = compose_transform(
        ["AddCanvasElement",
         "AddRelationConstraints(edge_ratio=0.9, seed=0, max_edges=16)"]
    )
    bwc = transform(rng, dict(layout))
    rel = RelationData.from_batch(bwc)
    cond = get_cond(jax.random.PRNGKey(1), layout, tok, "relation")
    sc = to_sampler_cond(cond, tok, SamplingConfig()).replace(
        relation=tuple(rel)
    )

    g = make_relation_guidance(
        tok, SamplingConfig(relation_num_update=3, relation_lambda=3e6)
    )
    mlp = jnp.asarray(rng.randn(4, tok.max_token_length, tok.N_total),
                      jnp.float32)
    # gated off below t=10; active above
    np.testing.assert_array_equal(
        np.asarray(g(mlp, jnp.asarray(5), sc)), np.asarray(mlp)
    )
    assert float(jnp.abs(g(mlp, jnp.asarray(12), sc) - mlp).max()) > 1.0

    bb = BackboneConfig(d_model=128, nhead=4, dim_feedforward=128,
                        num_layers=1, dropout=0.0,
                        timestep_type="adalayernorm", diffusion_step=T)
    model = LayoutDM(bb, tok, ModelConfig(num_timesteps=T))
    params = model.init(jax.random.PRNGKey(0))
    plain = model.sample_ids(params, jax.random.PRNGKey(2), 4, cond=sc)
    guided = model.sample_ids(params, jax.random.PRNGKey(2), 4, cond=sc,
                              guidance_fn=g)
    assert not np.array_equal(np.asarray(plain), np.asarray(guided))
    # strong constraints survive guidance
    np.testing.assert_array_equal(
        np.asarray(guided)[np.asarray(sc.strong_mask)],
        np.asarray(sc.seq)[np.asarray(sc.strong_mask)],
    )
