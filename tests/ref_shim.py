"""Import machinery for driving /root/reference's OWN code in parity tests.

The reference depends on omegaconf/hydra/torch_geometric/torchvision/prdc/
pytorch_fid, none of which exist in this environment.  Everything it actually
*uses* from them at parity-test time is tiny (attribute-dict configs, a
`_target_` instantiator, `to_dense_batch`/`to_dense_adj`, `T.Compose`, two
metric entry points), so we install minimal working stand-ins in
``sys.modules`` and then import the genuine reference modules from
``/root/reference/src/trainer`` unmodified.

This converts the round-1 "torch twin" parity tests (which compared against
re-implementations *we* wrote) into tests against the reference
implementation itself.
"""

from __future__ import annotations

import sys
import types

REF_SRC = "/root/reference/src/trainer"

_installed = False


class Data:
    """torch_geometric.data.Data stand-in (module-level so torch.save can
    pickle instances)."""

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


class AttrDict(dict):
    """Minimal omegaconf.DictConfig stand-in: dict + attribute access."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v

    def get(self, k, default=None):  # DictConfig.get semantics
        return dict.get(self, k, default)


def _make_omegaconf():
    mod = types.ModuleType("omegaconf")
    mod._ref_shim = True
    mod.DictConfig = AttrDict

    class OmegaConf:
        @staticmethod
        def structured(obj):
            return obj() if isinstance(obj, type) else obj

        @staticmethod
        def create(d=None):
            return AttrDict(d or {})

        @staticmethod
        def to_container(cfg, **kw):
            return dict(cfg)

    mod.OmegaConf = OmegaConf
    return mod


def _make_hydra():
    import importlib

    hydra = types.ModuleType("hydra")
    hydra._ref_shim = True
    utils = types.ModuleType("hydra.utils")

    def instantiate(cfg, **kwargs):
        cfg = {
            k: (
                instantiate(v)
                if isinstance(v, dict) and "_target_" in v
                else v
            )
            for k, v in dict(cfg).items()
        }
        target = cfg.pop("_target_")
        mod_name, cls_name = target.rsplit(".", 1)
        fn = getattr(importlib.import_module(mod_name), cls_name)
        cfg.update(kwargs)
        return fn(**cfg)

    utils.instantiate = instantiate
    hydra.utils = utils

    core = types.ModuleType("hydra.core")
    config_store = types.ModuleType("hydra.core.config_store")

    class ConfigStore:
        _instance = None

        @classmethod
        def instance(cls):
            if cls._instance is None:
                cls._instance = cls()
            return cls._instance

        def store(self, *a, **kw):
            pass

    config_store.ConfigStore = ConfigStore
    core.config_store = config_store
    hydra.core = core
    return hydra, utils, core, config_store


def _make_torch_geometric():
    import torch

    tg = types.ModuleType("torch_geometric")
    tg._ref_shim = True
    utils = types.ModuleType("torch_geometric.utils")

    def to_dense_batch(x, batch):
        """(N, *F) node features + (N,) graph index -> ((B, S, *F), (B, S))."""
        if batch.numel() == 0:
            shape = (0, 0) + tuple(x.shape[1:])
            return x.new_zeros(shape), torch.zeros(0, 0, dtype=torch.bool)
        B = int(batch.max().item()) + 1
        counts = torch.bincount(batch, minlength=B)
        S = int(counts.max().item())
        # position of each node within its graph (nodes are grouped by graph)
        cum = torch.cat([torch.zeros(1, dtype=torch.long), counts.cumsum(0)[:-1]])
        pos = torch.arange(batch.numel()) - cum[batch]
        out = x.new_zeros((B, S) + tuple(x.shape[1:]))
        out[batch, pos] = x
        mask = torch.zeros(B, S, dtype=torch.bool)
        mask[batch, pos] = True
        return out, mask

    def to_dense_adj(edge_index, batch=None, edge_attr=None, max_num_nodes=None):
        """(2, E) edges (+ per-graph node index) -> (B, S, S[, F]) dense adj."""
        if batch is None:
            n = (
                int(edge_index.max().item()) + 1
                if edge_index.numel()
                else 0
            )
            batch = torch.zeros(max(n, max_num_nodes or 0), dtype=torch.long)
        B = int(batch.max().item()) + 1 if batch.numel() else 1
        counts = torch.bincount(batch, minlength=B)
        S = max_num_nodes or (int(counts.max().item()) if batch.numel() else 0)
        cum = torch.cat([torch.zeros(1, dtype=torch.long), counts.cumsum(0)[:-1]])
        src, dst = edge_index[0], edge_index[1]
        g = batch[src]
        r = src - cum[g]
        c = dst - cum[g]
        if edge_attr is None:
            adj = torch.zeros(B, S, S)
            adj[g, r, c] = 1.0
        else:
            adj = torch.zeros((B, S, S) + tuple(edge_attr.shape[1:])).to(
                edge_attr.dtype
            )
            adj[g, r, c] = edge_attr
        return adj

    utils.to_dense_batch = to_dense_batch
    utils.to_dense_adj = to_dense_adj
    tg.utils = utils

    data_mod = types.ModuleType("torch_geometric.data")
    data_mod.__path__ = []  # package-like so submodule stubs register
    data_mod.Data = Data
    tg.data = data_mod

    # submodules the reference's VENDORED datasets/dataset.py imports at
    # module level; the vendored file redefines Dataset itself and the
    # parity tests bypass collate/separate by overriding `self.collate`
    sub = {}
    collate_mod = types.ModuleType("torch_geometric.data.collate")
    collate_mod.collate = lambda *a, **kw: (_ for _ in ()).throw(
        NotImplementedError("pyg collate stub")
    )
    sub["collate"] = collate_mod
    dataset_mod = types.ModuleType("torch_geometric.data.dataset")
    dataset_mod.Dataset = object
    dataset_mod.IndexType = object
    sub["dataset"] = dataset_mod
    makedirs_mod = types.ModuleType("torch_geometric.data.makedirs")
    import os as _os

    makedirs_mod.makedirs = lambda p: _os.makedirs(p, exist_ok=True)
    sub["makedirs"] = makedirs_mod
    separate_mod = types.ModuleType("torch_geometric.data.separate")
    separate_mod.separate = lambda *a, **kw: (_ for _ in ()).throw(
        NotImplementedError("pyg separate stub")
    )
    sub["separate"] = separate_mod
    return tg, utils, data_mod, sub


def _make_torchvision():
    tv = types.ModuleType("torchvision")
    tv._ref_shim = True
    transforms = types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, fns):
            self.transforms = fns

        def __call__(self, x):
            for f in self.transforms:
                x = f(x)
            return x

    class RandomApply:
        def __init__(self, fns, p=0.5):
            self.transforms = fns
            self.p = p

        def __call__(self, x):
            import random

            if random.random() < self.p:
                for f in self.transforms:
                    x = f(x)
            return x

    transforms.Compose = Compose
    transforms.RandomApply = RandomApply
    tv.transforms = transforms
    return tv, transforms


def _make_prdc():
    mod = types.ModuleType("prdc")
    mod._ref_shim = True

    def compute_prdc(real_features, fake_features, nearest_k):
        from layoutdm_tpu.eval.metrics import compute_prdc as ours

        return ours(real_features, fake_features, nearest_k=nearest_k)

    mod.compute_prdc = compute_prdc
    return mod


def _make_pytorch_fid():
    mod = types.ModuleType("pytorch_fid")
    mod._ref_shim = True
    fid_score = types.ModuleType("pytorch_fid.fid_score")

    def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6):
        from layoutdm_tpu.eval.metrics import frechet_distance

        return frechet_distance(mu1, sigma1, mu2, sigma2, eps=eps)

    fid_score.calculate_frechet_distance = calculate_frechet_distance
    mod.fid_score = fid_score
    return mod, fid_score


def _make_trainer_datasets():
    """Stub for `trainer.datasets` (the real one drags in the vendored
    torch-geometric Dataset machinery; the tokenizer only reads
    ``DATASETS[...].labels`` and class names, `layout_tokenizer.py:53-73`).

    The stub carries the real package's ``__path__`` so the GENUINE
    submodules (`trainer.datasets.rico`, `.publaynet`, `.base`, `.dataset`)
    remain importable for parser cross-validation tests."""
    from layoutdm_tpu.registry import DATASET_LABELS

    mod = types.ModuleType("trainer.datasets")
    mod._ref_shim = True
    mod.__path__ = [f"{REF_SRC}/trainer/datasets"]

    class Rico25Dataset:
        name = "rico25"
        labels = list(DATASET_LABELS["rico25"])

    class PubLayNetDataset:
        name = "publaynet"
        labels = list(DATASET_LABELS["publaynet"])

    mod.Rico25Dataset = Rico25Dataset
    mod.PubLayNetDataset = PubLayNetDataset
    mod.DATASETS = {d.name: d for d in (Rico25Dataset, PubLayNetDataset)}
    return mod


def install_stubs():
    global _installed
    if _installed:
        return
    if "omegaconf" not in sys.modules:
        sys.modules["omegaconf"] = _make_omegaconf()
    if "hydra" not in sys.modules:
        hydra, utils, core, cs = _make_hydra()
        sys.modules["hydra"] = hydra
        sys.modules["hydra.utils"] = utils
        sys.modules["hydra.core"] = core
        sys.modules["hydra.core.config_store"] = cs
    if "torch_geometric" not in sys.modules:
        tg, utils, data_mod, sub = _make_torch_geometric()
        sys.modules["torch_geometric"] = tg
        sys.modules["torch_geometric.utils"] = utils
        sys.modules["torch_geometric.data"] = data_mod
        for name, m in sub.items():
            sys.modules[f"torch_geometric.data.{name}"] = m
    if "torchvision" not in sys.modules:
        tv, transforms = _make_torchvision()
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = transforms
    if "prdc" not in sys.modules:
        sys.modules["prdc"] = _make_prdc()
    if "pycocotools" not in sys.modules:
        coco_pkg = types.ModuleType("pycocotools")
        coco_pkg._ref_shim = True
        coco_mod = types.ModuleType("pycocotools.coco")

        class COCO:
            """Faithful mini-COCO for the calls `publaynet.py:40-63` makes:
            annotations kept in file order per image (pycocotools
            createIndex semantics)."""

            def __init__(self, path):
                import json

                with open(path) as f:
                    d = json.load(f)
                self.imgs = {im["id"]: im for im in d["images"]}
                self.cats = {c["id"]: c for c in d["categories"]}
                self.anns = {a["id"]: a for a in d["annotations"]}
                self.imgToAnns = {}
                for a in d["annotations"]:
                    self.imgToAnns.setdefault(a["image_id"], []).append(a)

            def getImgIds(self):
                return list(self.imgs)

            def loadImgs(self, ids):
                ids = ids if isinstance(ids, (list, tuple)) else [ids]
                return [self.imgs[i] for i in ids]

            def getAnnIds(self, imgIds):
                return [
                    a["id"] for i in imgIds for a in self.imgToAnns.get(i, [])
                ]

            def loadAnns(self, ids):
                ids = ids if isinstance(ids, (list, tuple)) else [ids]
                return [self.anns[i] for i in ids]

        coco_mod.COCO = COCO
        coco_pkg.coco = coco_mod
        sys.modules["pycocotools"] = coco_pkg
        sys.modules["pycocotools.coco"] = coco_mod
    if "torch._six" not in sys.modules:
        # removed from modern torch; `helpers/scheduler.py:8` imports `inf`
        import math

        six = types.ModuleType("torch._six")
        six._ref_shim = True
        six.inf = math.inf
        sys.modules["torch._six"] = six
    if "pytorch_fid" not in sys.modules:
        mod, fid_score = _make_pytorch_fid()
        sys.modules["pytorch_fid"] = mod
        sys.modules["pytorch_fid.fid_score"] = fid_score
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    # must be registered before anything does `from trainer.datasets import …`
    if "trainer.datasets" not in sys.modules:
        import trainer  # noqa: F401  (empty __init__, just the package)

        sys.modules["trainer.datasets"] = _make_trainer_datasets()
    _installed = True


def load_reference():
    """Install stubs and return the reference modules used by parity tests."""
    install_stubs()
    import trainer.helpers.bbox_tokenizer as ref_bbox_tokenizer
    import trainer.helpers.layout_tokenizer as ref_layout_tokenizer
    import trainer.models.categorical_diffusion.constrained as ref_constrained
    import trainer.models.categorical_diffusion.util as ref_util
    import trainer.models.categorical_diffusion.vanilla as ref_vanilla

    return types.SimpleNamespace(
        util=ref_util,
        vanilla=ref_vanilla,
        constrained=ref_constrained,
        bbox_tokenizer=ref_bbox_tokenizer,
        layout_tokenizer=ref_layout_tokenizer,
    )


def make_ref_tokenizer(
    dataset: str = "rico25",
    max_seq_length: int = 25,
    num_bin_bboxes: int = 32,
    shared_bbox_vocab: str = "x-y-w-h",
    bbox_quantization: str = "linear",
    var_order: str = "c-x-y-w-h",
    special_tokens=("pad", "mask"),
    pad_until_max: bool = True,
):
    """Build the reference's LayoutSequenceTokenizer with explicit configs
    (mirrors `config/experiment/layoutdm.yaml` for the flagship)."""
    install_stubs()
    from trainer.helpers.layout_tokenizer import LayoutSequenceTokenizer

    cls_name = {"rico25": "Rico25Dataset", "publaynet": "PubLayNetDataset"}[
        dataset
    ]
    data_cfg = AttrDict(
        num_bin_bboxes=num_bin_bboxes,
        shared_bbox_vocab=shared_bbox_vocab,
        bbox_quantization=bbox_quantization,
        var_order=var_order,
        special_tokens=list(special_tokens),
        pad_until_max=pad_until_max,
    )
    dataset_cfg = AttrDict(
        _target_=f"trainer.datasets.{cls_name}",
        max_seq_length=max_seq_length,
    )
    return LayoutSequenceTokenizer(data_cfg, dataset_cfg)


class SparseBatch:
    """torch_geometric DataBatch stand-in: exactly the attributes the
    reference's `sparse_to_dense` (`data/util.py:270-286`), `get_cond`
    (`task.py:43-55`), and the clg losses (`clg/const.py:59-217`) read."""

    def __init__(self, x, y, batch, attr=None, edge_index=None, edge_attr=None):
        self.x = x
        self.y = y
        self.batch = batch
        self.attr = attr if attr is not None else {}
        if edge_index is not None:
            self.edge_index = edge_index
        if edge_attr is not None:
            self.edge_attr = edge_attr

    def to(self, device):
        return self


def dense_to_sparse_batch(label, bbox, mask, add_canvas=False):
    """Dense numpy (label, bbox, mask) -> reference-style sparse batch.

    With ``add_canvas`` the AddCanvasElement transform (`data/util.py:111-125`)
    is replayed: a [0.5, 0.5, 1, 1] box with label 0 is prepended per graph and
    element labels shift by +1.
    """
    import numpy as np
    import torch

    xs, ys, bs = [], [], []
    for i in range(label.shape[0]):
        v = np.asarray(mask[i], bool)
        x = np.asarray(bbox[i], np.float32)[v]
        y = np.asarray(label[i], np.int64)[v]
        if add_canvas:
            x = np.concatenate(
                [np.asarray([[0.5, 0.5, 1.0, 1.0]], np.float32), x], axis=0
            )
            y = np.concatenate([np.asarray([0], np.int64), y + 1])
        xs.append(x)
        ys.append(y)
        bs.append(np.full(len(y), i, np.int64))
    return SparseBatch(
        x=torch.from_numpy(np.concatenate(xs, axis=0)),
        y=torch.from_numpy(np.concatenate(ys)),
        batch=torch.from_numpy(np.concatenate(bs)),
        attr={"has_canvas_element": add_canvas},
    )


def make_backbone_cfg(
    d_model=64,
    nhead=4,
    dim_feedforward=128,
    num_layers=2,
    timestep_type="adalayernorm",
    num_timesteps=100,
):
    """hydra-style backbone config for the reference TransformerEncoder —
    nested encoder_layer Block like `config/backbone/medium.yaml` with the
    `config/experiment/layoutdm.yaml` timestep overrides, scaled down."""
    return AttrDict(
        _target_="trainer.models.transformer_utils.TransformerEncoder",
        encoder_layer=AttrDict(
            _target_="trainer.models.transformer_utils.Block",
            d_model=d_model,
            nhead=nhead,
            dim_feedforward=dim_feedforward,
            dropout=0.0,
            batch_first=True,
            norm_first=True,
            timestep_type=timestep_type,
            diffusion_step=num_timesteps,
        ),
        num_layers=num_layers,
    )
