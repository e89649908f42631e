"""Full-vocab <-> per-attribute partial-vocab conversion tables.

Re-design of the reference `Converter` (`helpers/layout_tokenizer.py:414-568`).
The reference keeps one partial vocabulary per attribute (category: N_cat+2;
each coordinate: num_bins+2, pad/mask appended) and loops over the five
attributes with python-side scatter/gather.  Here every partial vocabulary is
padded to one static width ``Vp = max(N_cat, num_bins) + 2`` with

    lane 0 .. n_normal[a]-1   : the attribute's "normal" tokens (incl. PAD,
                                which the reference also treats as a normal
                                row of the transition matrix)
    lane n_normal[a] .. Vp-2  : dead lanes (log-prob pinned to LOG_EPS)
    lane Vp-1                 : MASK (always last, matching the full vocab)

so the whole (B, S_elem, A, Vp) tensor converts in ONE gather each way and
the per-attribute transition math vectorizes over axis A with no loop.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from layoutdm_tpu.ops.log_math import LOG_EPS
from layoutdm_tpu.tokenizer.sequence import LayoutSequenceTokenizer


@dataclass(frozen=True)
class Converter:
    A: int  # attributes per element (5)
    Vf: int  # full vocab size (tokenizer.N_total)
    Vp: int  # padded partial vocab width
    n_normal: np.ndarray  # (A,) normal lanes per attr = mat_size - 1
    p2f: np.ndarray  # (A, Vp) partial lane -> full id (dead lanes -> 0)
    f2p: np.ndarray  # (A, Vf) full id -> partial lane (-1 if absent)
    lane_valid: np.ndarray  # (A, Vp) bool: lane carries probability mass
    # (A, Vf, Vp) one-hot permutation matrix: route[a, u, v] = 1 iff full id
    # u <-> partial lane v.  Log-prob conversion becomes a batched matmul on
    # the MXU — minor-dim gathers are pathologically slow on TPU (measured
    # ~400ms/call at B=1024 vs <1ms as a matmul).
    route: np.ndarray = None

    @classmethod
    def build(cls, tok: LayoutSequenceTokenizer) -> "Converter":
        assert "pad" in tok.special_tokens and "mask" in tok.special_tokens
        # the partial vocabularies cover attribute tokens + PAD + MASK only;
        # BOS/EOS ids have no lane and would silently alias to lane 0 in
        # f_to_p_id (the reference's _bucketize asserts the same way,
        # `layout_tokenizer.py:407-408`)
        assert set(tok.special_tokens) <= {"pad", "mask"}, (
            "constrained diffusion requires special_tokens ('pad','mask'); "
            f"got {tok.special_tokens}"
        )
        A = tok.N_var_per_element
        Vf = tok.N_total
        pad_id, mask_id = tok.name_to_id("pad"), tok.name_to_id("mask")

        # mat_size per attr (`constrained.py:50-54`)
        mat_size = [tok.N_category + 2] + [tok.N_bbox_per_var + 2] * (A - 1)
        Vp = max(mat_size)

        p2f = np.zeros((A, Vp), dtype=np.int32)
        f2p = np.full((A, Vf), -1, dtype=np.int32)
        lane_valid = np.zeros((A, Vp), dtype=bool)
        n_normal = np.asarray(mat_size, dtype=np.int32) - 1

        for a, key in enumerate(tok.var_names):
            if key == "c":
                full_ids = list(range(tok.N_category))
            else:
                sl = tok.get_slice(key)
                full_ids = list(range(sl.start, sl.stop))
            # normal lanes: attribute tokens then PAD; final lane: MASK
            full_ids = full_ids + [pad_id]
            for lane, fid in enumerate(full_ids):
                p2f[a, lane] = fid
                f2p[a, fid] = lane
                lane_valid[a, lane] = True
            p2f[a, Vp - 1] = mask_id
            f2p[a, mask_id] = Vp - 1
            lane_valid[a, Vp - 1] = True
            assert len(full_ids) == n_normal[a]

        route = np.zeros((A, Vf, Vp), dtype=np.float32)
        for a in range(A):
            for lane in range(Vp):
                if lane_valid[a, lane]:
                    route[a, p2f[a, lane], lane] = 1.0

        return cls(
            A=A, Vf=Vf, Vp=Vp, n_normal=n_normal, p2f=p2f, f2p=f2p,
            lane_valid=lane_valid, route=route,
        )

    # ---- log-prob conversion (vocab-last layout) --------------------------
    # Both directions are applications of the same (A, Vf, Vp) one-hot
    # permutation matrix, so each conversion is ONE batched matmul on the MXU
    # (replacing the per-key scatter/gather loop of
    # `layout_tokenizer.py:540-557`).

    def f_to_p_log(self, log_full: jnp.ndarray) -> jnp.ndarray:
        """(B, S, A, Vf) -> (B, S, A, Vp); dead lanes get LOG_EPS."""
        route = jnp.asarray(self.route)
        picked = jnp.einsum(
            "bsau,auv->bsav", log_full, route,
            preferred_element_type=jnp.float32,
        )
        return jnp.where(
            jnp.asarray(self.lane_valid)[None, None], picked, LOG_EPS
        )

    def p_to_f_log(self, log_part: jnp.ndarray) -> jnp.ndarray:
        """(B, S, A, Vp) -> (B, S, A, Vf); absent ids get LOG_EPS."""
        route = jnp.asarray(self.route)
        placed = jnp.einsum(
            "bsav,auv->bsau", log_part, route,
            preferred_element_type=jnp.float32,
        )
        present = jnp.asarray(self.f2p >= 0)[None, None]
        return jnp.where(present, placed, LOG_EPS)

    # ---- id conversion ----------------------------------------------------
    # flat 1-D table lookups: ids index into the per-attribute row of the
    # flattened (A*V,) table — one small gather, no broadcasted index tensor.

    def f_to_p_id(self, ids_full: jnp.ndarray) -> jnp.ndarray:
        """(B, S, A) full ids -> partial lanes (`f_to_p_id_all`,
        `layout_tokenizer.py:523-538`)."""
        flat = jnp.asarray(np.maximum(self.f2p, 0).reshape(-1))
        offs = jnp.arange(self.A, dtype=ids_full.dtype) * self.Vf
        return flat[ids_full + offs[None, None, :]]

    def p_to_f_id(self, ids_part: jnp.ndarray) -> jnp.ndarray:
        """(B, S, A) partial lanes -> full ids (`p_to_f_id_all`,
        `layout_tokenizer.py:499-513`)."""
        flat = jnp.asarray(self.p2f.reshape(-1))
        offs = jnp.arange(self.A, dtype=ids_part.dtype) * self.Vp
        return flat[ids_part + offs[None, None, :]]
