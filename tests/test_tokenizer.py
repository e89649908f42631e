"""Tokenizer invariants: round-trip, vocab layout, converter bijection.

These are the tests the reference never had (SURVEY.md §4): encode∘decode is
the identity on quantized layouts; the converter's full<->partial mapping is
a bijection on each attribute's legal ids.
"""

import numpy as np
import pytest

from layoutdm_tpu.tokenizer.bbox import BboxTokenizer, linear_centers
from layoutdm_tpu.tokenizer.clustering import fit_coordinate_clusters, kmeans_1d
from layoutdm_tpu.tokenizer.converter import Converter
from layoutdm_tpu.tokenizer.sequence import LayoutSequenceTokenizer


def make_tokenizer(
    shared_vocab="x-y-w-h",
    quantization="linear",
    special=("pad", "mask"),
    var_order=("x", "y", "w", "h"),
    num_categories=25,
    max_elements=25,
    pad_until_max=True,
    centers=None,
):
    bb = BboxTokenizer(
        num_bins=32,
        var_order=var_order,
        shared_vocab=shared_vocab,
        quantization=quantization,
        centers=centers,
    )
    return LayoutSequenceTokenizer(
        bbox_tokenizer=bb,
        num_categories=num_categories,
        max_elements=max_elements,
        special_tokens=special,
        pad_until_max=pad_until_max,
    )


def random_layout(rng, B=4, S=25, n_cat=25):
    n = rng.randint(1, S + 1, size=(B,))
    mask = np.arange(S)[None, :] < n[:, None]
    label = rng.randint(0, n_cat, size=(B, S)) * mask
    bbox = rng.rand(B, S, 4).astype(np.float32)
    bbox[..., 2:] = np.clip(bbox[..., 2:], 1 / 32, 1.0)
    return {"label": label, "bbox": bbox * mask[..., None], "mask": mask}


@pytest.mark.parametrize("shared_vocab", ["xywh", "x-y-w-h"])
@pytest.mark.parametrize("quantization", ["linear", "kmeans"])
def test_roundtrip_identity_on_quantized(rng, shared_vocab, quantization):
    centers = None
    if quantization == "kmeans":
        data = rng.rand(5000, 4).astype(np.float32)
        fitted = fit_coordinate_clusters(data, (32,), "kmeans")
        centers = np.stack([fitted[f"{k}-32"] for k in "xywh"])
    tok = make_tokenizer(shared_vocab, quantization, centers=centers)
    layout = random_layout(rng)
    enc = tok.encode(layout)
    dec = tok.decode(np.asarray(enc["seq"]))
    # masks identical
    np.testing.assert_array_equal(np.asarray(dec["mask"]), layout["mask"])
    # second round-trip is exact: quantization is idempotent
    enc2 = tok.encode(
        {"label": dec["label"], "bbox": dec["bbox"], "mask": dec["mask"]}
    )
    np.testing.assert_array_equal(np.asarray(enc2["seq"]), np.asarray(enc["seq"]))
    # labels survive the first trip
    np.testing.assert_array_equal(
        np.asarray(dec["label"]) * layout["mask"], layout["label"] * layout["mask"]
    )


def test_linear_quantization_reference_semantics():
    """Golden check of the linear grid against `bbox_tokenizer.py:88-91,141-146`."""
    bb = BboxTokenizer(num_bins=32, quantization="linear", shared_vocab="x-y-w-h")
    d = 1 / 32
    bbox = np.array([[[0.0, 1.0, d, 1.0]]], dtype=np.float32)
    ids = np.asarray(bb.encode(bbox))[0, 0]
    # x=0 -> bin 0; y=1 clamps to 1-d -> bin 31; w=d -> bin 0; h=1 -> bin 31
    np.testing.assert_array_equal(ids, [0, 31 + 32, 0 + 64, 31 + 96])
    dec = np.asarray(bb.decode(np.asarray(bb.encode(bbox))))[0, 0]
    np.testing.assert_allclose(dec, [0.0, 1.0 - d, d, 1.0], atol=1e-6)


def test_pad_tokens_written_into_all_slots(rng):
    tok = make_tokenizer()
    layout = random_layout(rng, B=2, S=25)
    layout["mask"][:, 3:] = False
    enc = tok.encode(layout)
    seq = np.asarray(enc["seq"]).reshape(2, 25, 5)
    pad_id = tok.name_to_id("pad")
    assert (seq[:, 3:] == pad_id).all()
    assert not (seq[:, :3] == pad_id).any()


def test_bos_eos_encode(rng):
    tok = make_tokenizer(special=("pad", "bos", "eos", "mask"), pad_until_max=True)
    layout = random_layout(rng, B=3, S=25)
    layout["mask"][:] = False
    layout["mask"][:, :2] = True
    enc = tok.encode(layout)
    seq = np.asarray(enc["seq"])
    assert seq.shape[1] == 25 * 5 + 1
    assert (seq[:, 0] == tok.name_to_id("bos")).all()
    assert (seq[:, 1 + 2 * 5] == tok.name_to_id("eos")).all()


def test_token_mask_layout():
    tok = make_tokenizer(shared_vocab="x-y-w-h")
    m = tok.token_mask()
    assert m.shape == (125, tok.N_total)
    # category slot: only categories + pad/eos-style specials legal
    assert m[0, : tok.N_category].all()
    assert not m[0, tok.N_category : tok.N_category + tok.N_bbox].any()
    # mask id never legal
    assert not m[:, tok.name_to_id("mask")].any()
    # x slot points at x sub-vocab only
    sl = tok.get_slice("x")
    assert m[1, sl].all()
    assert not m[1, tok.get_slice("y")].any()
    # every slot's legal set is row-periodic with period 5
    np.testing.assert_array_equal(m[:5], m[5:10])


def test_converter_bijection():
    tok = make_tokenizer(shared_vocab="x-y-w-h")
    cv = Converter.build(tok)
    assert cv.Vp == 34  # max(25,32)+2
    np.testing.assert_array_equal(cv.n_normal, [26, 33, 33, 33, 33])
    # p2f∘f2p = identity on each attribute's legal full ids
    for a, key in enumerate(tok.var_names):
        legal = list(range(*([tok.get_slice(key).start, tok.get_slice(key).stop])))
        legal += [tok.name_to_id("pad"), tok.name_to_id("mask")]
        for fid in legal:
            lane = cv.f2p[a, fid]
            assert lane >= 0
            assert cv.p2f[a, lane] == fid
    # mask is always the last lane
    assert (cv.p2f[:, -1] == tok.name_to_id("mask")).all()


def test_converter_log_roundtrip(rng):
    import jax.numpy as jnp

    from layoutdm_tpu.ops.log_math import LOG_EPS

    tok = make_tokenizer(shared_vocab="x-y-w-h")
    cv = Converter.build(tok)
    B, S = 2, 25
    # random ids per attr drawn from that attr's legal set
    ids_f = np.zeros((B, S, 5), dtype=np.int32)
    for a, key in enumerate(tok.var_names):
        sl = tok.get_slice(key)
        choices = list(range(sl.start, sl.stop)) + [
            tok.name_to_id("pad"),
            tok.name_to_id("mask"),
        ]
        ids_f[..., a] = rng.choice(choices, size=(B, S))
    ids_p = np.asarray(cv.f_to_p_id(jnp.asarray(ids_f)))
    back = np.asarray(cv.p_to_f_id(jnp.asarray(ids_p)))
    np.testing.assert_array_equal(back, ids_f)

    # log round trip: full -> partial -> full preserves legal lanes
    logf = np.full((B, S, 5, tok.N_total), LOG_EPS, dtype=np.float32)
    for a in range(5):
        np.put_along_axis(
            logf[:, :, a], ids_f[..., a][..., None], 0.0, axis=-1
        )
    logp = cv.f_to_p_log(jnp.asarray(logf))
    logf2 = np.asarray(cv.p_to_f_log(logp))
    np.testing.assert_allclose(logf2, logf, atol=1e-6)


def test_kmeans_1d_recovers_clusters(rng):
    x = np.concatenate([rng.randn(300) * 0.01 + c for c in (0.1, 0.5, 0.9)])
    centers = kmeans_1d(x, 3)
    np.testing.assert_allclose(centers, [0.1, 0.5, 0.9], atol=0.01)


def test_tolerant_pickle_loader(tmp_path, rng):
    """Reference clustering pickles load without sklearn installed."""
    import pickle
    import sys
    import types

    mod = types.ModuleType("sklearn_stub.cluster")

    class KMeans:
        pass

    KMeans.__module__ = "sklearn_stub.cluster"
    KMeans.__qualname__ = "KMeans"
    mod.KMeans = KMeans
    sys.modules["sklearn_stub"] = types.ModuleType("sklearn_stub")
    sys.modules["sklearn_stub.cluster"] = mod
    models = {}
    for k in "xywh":
        m = KMeans()
        m.cluster_centers_ = rng.rand(32, 1)
        models[f"{k}-32"] = m
    path = str(tmp_path / "clusters.pkl")
    with open(path, "wb") as f:
        pickle.dump(models, f)
    del sys.modules["sklearn_stub"], sys.modules["sklearn_stub.cluster"]

    from layoutdm_tpu.tokenizer.bbox import load_kmeans_centers

    centers = load_kmeans_centers(path, 32)
    assert centers.shape == (4, 32)
    assert (np.diff(centers, axis=1) >= 0).all()


def test_percentile_quantization_roundtrip(rng):
    """Percentile (equal-mass) binning quantizes and round-trips."""
    data = rng.rand(5000, 4).astype(np.float32)
    fitted = fit_coordinate_clusters(data, (32,), "percentile")
    centers = np.stack([fitted[f"{k}-32"] for k in "xywh"])
    tok = make_tokenizer(
        "x-y-w-h", "percentile", centers=centers, num_categories=4,
        max_elements=4,
    )
    layout = random_layout(rng, B=2, S=4, n_cat=4)
    enc = tok.encode(layout)
    dec = tok.decode(np.asarray(enc["seq"]))
    enc2 = tok.encode(
        {"label": dec["label"], "bbox": dec["bbox"], "mask": dec["mask"]}
    )
    np.testing.assert_array_equal(np.asarray(enc2["seq"]), np.asarray(enc["seq"]))
