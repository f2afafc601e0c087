"""Latent-space subsystem (SURVEY.md §2 component 10).

Parity target: latent_space.py — a frozen pretrained ResCNN (depth-5
features) embeds batches for (a) closestknn/closestbins pairing
(augmentations.py:398, :452) and (b) out-of-manifold-intrusion analysis
dumps during training (train_model.py:508-518); t-SNE/PCA plots run on host
(sklearn).

The reference hardcodes the embedding checkpoint path and gates the loader
behind ``if False:`` (latent_space.py:23-41) — i.e. the module must be
hand-enabled.  Here :class:`LatentSpace` takes the checkpoint path
explicitly and loads once.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from pcgmix_tpu import utils


#: the canonical pretrained latent-space run the reference hardcodes
#: (latent_space.py:27-29: 'PhysioNet_ResCNN_base_epochs=10_bs=32_nfrac=1.0
#: _op=adam_sched=True_lrmax=0.00089_tbal=True_chs=4_gc=0.1_seed(data)=3
#: _valid=False_seed=1'); the out-of-manifold-intrusion study trains it
#: first (experiments_timeseries.ipynb cell 13).
LATENT_PRETRAIN_OVERRIDES = dict(
    model="ResCNN", method="base", num_epochs=10, batch_size=32,
    lr_max=0.00089, n_fraction=1.0, seed_data=3, seed=1, op="adam",
    valid=False,
)


def latent_pretrain_config(cfg):
    """The frozen-embedding-model run config for ``cfg``'s environment.

    Built FRESH from defaults so the run is genuinely canonical: only
    environment/performance fields are inherited from ``cfg`` — run-variant
    fields that are not encoded in the run-dir name (torch_init, true_seed,
    classical_space, latent_space, ...) must stay at their defaults, or a
    variant run would train a non-canonical checkpoint under the canonical
    directory name."""
    from pcgmix_tpu.train.loop import TrainConfig

    if cfg.spectrogram:
        raise ValueError(
            "closestknn/closestbins pairing is a 1-D surface; the reference "
            "has no 2-D latent-space model (augmentations2d.py has no "
            "closest* branches)"
        )
    return TrainConfig(
        # environment / performance fields (semantics-neutral)
        dataset=cfg.dataset,
        sig_len=cfg.sig_len,
        num_channels=cfg.num_channels,
        num_classes=cfg.num_classes,
        sample_rate=cfg.sample_rate,
        experiments_root=cfg.experiments_root,
        loader_parity=cfg.loader_parity,
        compute_dtype=cfg.compute_dtype,
        steps_per_dispatch=cfg.steps_per_dispatch,
        n_devices=cfg.n_devices,
        use_pallas=cfg.use_pallas,
        pallas_interpret=cfg.pallas_interpret,
        eval_batch_size=cfg.eval_batch_size,
        save_artifacts=True,  # the checkpoint IS the artifact
        plot=cfg.plot,
        # the canonical hyperparameters (latent_space.py:27-29)
        **LATENT_PRETRAIN_OVERRIDES,
    )


def latent_space_for(cfg) -> "LatentSpace":
    """Load the canonical frozen latent model for ``cfg``'s experiments_root
    (the auto-resolution behind closestknn/bins pairing).  Raises with a
    pointer to the runner when the pretrained run doesn't exist."""
    from pcgmix_tpu.exp.dirs import experiment_dir

    dep = latent_pretrain_config(cfg)
    path = os.path.join(experiment_dir(dep), "model.msgpack")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"(closestknn/closestbins) pairing needs the pretrained "
            f"latent-space model at {path} (latent_space.py:27-29). Train it "
            f"first (pcgmix-run resolves this dependency automatically), or "
            f"pass latent_feature_fn to train_model explicitly."
        )
    return LatentSpace(
        path, num_channels=cfg.num_channels, sig_len=cfg.sig_len,
        num_classes=cfg.num_classes,
    )


class LatentSpace:
    """Frozen embedding model: ResCNN depth-5 features (B, 128)
    (latent_space.py:43-47)."""

    def __init__(
        self,
        checkpoint_path: str,
        model_name: str = "ResCNN",
        num_channels: int = 4,
        sig_len: int = 2500,
        num_classes: int = 2,
    ):
        from pcgmix_tpu.models import build_model
        from pcgmix_tpu.train.loop import load_checkpoint

        self.model = build_model(model_name, num_classes=num_classes, train=False)
        restored = load_checkpoint(
            checkpoint_path, self.model, (1, num_channels, sig_len)
        )
        self._params = restored["params"]
        self._batch_stats = restored["batch_stats"]
        depth = {"ResCNN": 5, "resnet9": 3, "FCN": 4, "Potes": 1}.get(model_name, 5)

        @jax.jit
        def embed(data):
            return self.model.apply(
                {"params": self._params, "batch_stats": self._batch_stats},
                data,
                depth=depth,
                part="first",
            )

        self._embed = embed

    def generate(self, data) -> np.ndarray:
        """(B, D) embeddings (generate_latent_space, latent_space.py:43-47)."""
        return np.asarray(self._embed(jnp.asarray(data)))

    @property
    def variables(self) -> dict:
        """The restored flax variable collections (for get_hidden_features)."""
        return {"params": self._params, "batch_stats": self._batch_stats}


def save_latent_space(dct: dict, split: str, step: int, results_dir: str) -> None:
    """Dump a {'fts', 'target'} dict to latent_space/latent_space_<split>_<step>.pkl
    (latent_space.py:49-52)."""
    d = utils.check_folder(os.path.join(results_dir, "latent_space"))
    utils.save_dict(dct, os.path.join(d, f"latent_space_{split}_{step}.pkl"))


@functools.partial(jax.jit, static_argnames=("model",))
def _both_heads(model, variables, x):
    """(latent_space features, full-forward logits) in one jitted call —
    module-scope so the compile is cached per (model, shape) across
    get_hidden_features calls (flax Modules hash by their static fields)."""
    return (
        model.apply(variables, x, depth=0, part="latent_space"),
        model.apply(variables, x),
    )


def get_hidden_features(model, variables, ds, *, batch_size: int = 256):
    """Whole-split feature dump: returns (fts, trgts, confs, indcs)
    (latent_space.py:66-90).

    The reference's function targets 'hidden_rep'/'hidden_rep_to_confs'
    pass_parts that no model in its repo still implements (it sits under an
    '### OLD' marker); the live equivalent implemented here is
    ``part='latent_space'`` features plus the full-forward logits as the
    confidence head.  ds: an ArrayDataset (or anything with .data/.label).

    Both heads come out of ONE jitted call: the two applies share an
    identical trunk (every model's full forward is head(latent_space
    features)), so XLA CSE computes it once — the reference's
    single-pass-two-heads cost, without a per-model dual-output part.
    """
    fts_l, confs_l = [], []
    n = len(ds.data)
    for start in range(0, n, batch_size):
        x = jnp.asarray(ds.data[start : start + batch_size])
        f, c = _both_heads(model, variables, x)
        fts_l.append(np.asarray(f))
        confs_l.append(np.asarray(c))
    fts = np.concatenate(fts_l) if fts_l else np.zeros((0, 0))
    confs = np.concatenate(confs_l) if confs_l else np.zeros((0, 0))
    trgts = list(np.asarray(ds.label))
    indcs = list(range(n))
    return fts, trgts, confs, indcs


def dim_reduc_tsne(fts: np.ndarray, fts_new: np.ndarray, num_components: int = 2):
    """Joint t-SNE of original+augmented features (latent_space.py:92-106)."""
    from sklearn.manifold import TSNE

    n = fts.shape[0]
    both = np.concatenate([fts, fts_new], axis=0)
    np.random.seed(4)
    emb = TSNE(
        n_components=num_components,
        learning_rate="auto",
        init="random",
        perplexity=min(15, len(both) - 1),
        random_state=4,
    ).fit_transform(both)
    return emb[:n], emb[n:], -1.0


def dim_reduc_pca(fts: np.ndarray, fts_new: np.ndarray, num_components: int = 2):
    """PCA fit on originals, transform both (latent_space.py:108-118)."""
    from sklearn.decomposition import PCA

    pca = PCA(n_components=num_components).fit(fts)
    new_t = (
        pca.transform(fts_new)
        if len(fts_new)
        else np.zeros((0, num_components))
    )
    return (
        pca.transform(fts),
        new_t,
        float(np.sum(pca.explained_variance_ratio_)),
    )


def plot_latent_space(
    latent_features: dict,
    split: str,
    epoch: int,
    num_classes: int,
    method: str,
    results_dir: str,
    dim_reduc: str = "pca",
) -> str:
    """Scatter originals (and augmented points when method != 'base') in a
    2-D reduced space with per-class centroids/medoids
    (latent_space.py:134-195).  Returns the written png path."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from scipy.spatial import distance_matrix

    fts = np.asarray(latent_features["fts"])
    # the training loop dumps {'fts', 'target'} (loop.py:579); accept the
    # reference notebooks' 'trgts' spelling too
    trgts = np.asarray(
        latent_features["target"] if "target" in latent_features
        else latent_features["trgts"]
    )
    has_new = "fts_new" in latent_features
    fts_new = np.asarray(latent_features["fts_new"]) if has_new else None
    trgts_new = (
        np.asarray(latent_features.get("trgts_new", trgts)) if has_new else trgts
    )

    if not has_new:
        # no augmented points: embed the originals alone — concatenating a
        # duplicate copy would distort t-SNE's neighbor structure
        if dim_reduc == "tsne":
            fts, _, expl = dim_reduc_tsne(fts, fts[:0])
        else:
            fts, _, expl = dim_reduc_pca(fts, fts[:0])
        fts_new = fts
    elif dim_reduc == "tsne":
        fts, fts_new, expl = dim_reduc_tsne(fts, fts_new)
    else:
        fts, fts_new, expl = dim_reduc_pca(fts, fts_new)

    lo = fts.min(axis=0)
    rng = fts.max(axis=0) - lo
    rng[rng == 0] = 1.0
    fts = (fts - lo) / rng
    fts_new = (fts_new - lo) / rng

    fig = plt.figure(figsize=(6, 6))
    palettes = [("red", "blue", "o", 0.15, fts, trgts, "")]
    if method != "base":
        palettes.append(("darkred", "darkblue", "P", 1.0, fts_new, trgts_new, "_new"))
    for c0, c1, marker, alpha, f, t, suffix in palettes:
        for lbl, color in zip(range(num_classes), (c0, c1)):
            pts = f[t == lbl]
            if len(pts) == 0:
                continue
            med = int(np.argmin(distance_matrix(pts, pts).sum(axis=0)))
            plt.scatter(
                pts[:, 0], pts[:, 1], label=f"{lbl}{suffix}",
                facecolors="none", edgecolors=color, s=30, marker=marker, alpha=alpha,
            )
            plt.scatter(pts[:, 0].mean(), pts[:, 1].mean(), color=color, marker="x")
            plt.annotate(str(lbl), (pts[med, 0], pts[med, 1]))
    plt.grid()
    plt.title(
        f"{dim_reduc}; Data: {split}; Total explained variance: "
        f"{round(expl, 3)}; Epoch: {epoch}"
    )
    plt.legend()
    out_dir = utils.check_folder(os.path.join(results_dir, "latent_space"))
    path = os.path.join(out_dir, f"{dim_reduc}_{split}_{epoch}.png")
    plt.savefig(path)
    plt.close(fig)
    return path


def plot_latent_space_test(
    latent_features: dict,
    split: str,
    epoch: int,
    num_classes: int,
    method: str,
    results_dir: str,
    dim_reduc: str = "tsne",
) -> str:
    """Test-set-only variant (latent_space.py:197-240): one cloud, no
    augmented points.  ``method`` is accepted and IGNORED — the reference's
    own signature takes it and never reads it (latent_space.py:197), so it
    is kept purely for signature parity.  Returns the written png path."""
    feats = {
        "fts": np.asarray(latent_features["fts"]),
        "trgts": np.asarray(
            latent_features["target"]
            if "target" in latent_features
            else latent_features["trgts"]
        ),
    }
    return plot_latent_space(
        feats, split, epoch, num_classes, "base", results_dir, dim_reduc
    )


def _scatter_classes(plt, fts, trgts, num_classes, colors, marker, alpha, tag):
    """Shared per-class scatter with centroid 'x' and medoid annotation
    (the common body of the reference's three plot functions)."""
    from scipy.spatial import distance_matrix

    for lbl, color in zip(range(num_classes), colors):
        pts = fts[np.asarray(trgts) == lbl]
        if len(pts) == 0:
            continue
        med = int(np.argmin(distance_matrix(pts, pts).sum(axis=0)))
        plt.scatter(
            pts[:, 0], pts[:, 1], label=f"{lbl}{tag}",
            facecolors="none", edgecolors=color, s=30, marker=marker, alpha=alpha,
        )
        plt.scatter(pts[:, 0].mean(), pts[:, 1].mean(), color=color, marker="x")
        plt.annotate(str(lbl), (pts[med, 0], pts[med, 1]))


def plot_latent_space_test_train(
    latent_features_test: dict,
    latent_features_train: dict,
    split: str,
    epoch: int,
    num_classes: int,
    method: str,
    results_dir: str,
    dim_reduc: str = "tsne",
) -> tuple[str, str]:
    """Joint test/train embedding (latent_space.py:242-311): reduce test
    'fts' and train 'fts_new' together, normalize with the JOINT min/max,
    then write two pngs — `{dim_reduc}_{split}(test)_{epoch}.png` (o marks)
    and `{dim_reduc}_{split}(train)_{epoch}.png` (P marks, dark palette).
    Returns both png paths."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fts_test = np.asarray(latent_features_test["fts"])
    trgts_test = np.asarray(
        latent_features_test.get("target", latent_features_test.get("trgts"))
    )
    fts_train = np.asarray(latent_features_train["fts_new"])
    trgts_train = np.asarray(
        latent_features_train.get("trgts_new", latent_features_train.get("target"))
    )

    if dim_reduc == "tsne":
        fts_test, fts_train, expl = dim_reduc_tsne(fts_test, fts_train)
    else:
        fts_test, fts_train, expl = dim_reduc_pca(fts_test, fts_train)

    lo = np.minimum(fts_test.min(axis=0), fts_train.min(axis=0))
    hi = np.maximum(fts_test.max(axis=0), fts_train.max(axis=0))
    rng = hi - lo
    rng[rng == 0] = 1.0
    fts_test = (fts_test - lo) / rng
    fts_train = (fts_train - lo) / rng

    out_dir = utils.check_folder(os.path.join(results_dir, "latent_space"))
    paths = []
    for tag, fts, trgts, colors, marker in (
        ("test", fts_test, trgts_test, ("red", "blue"), "o"),
        ("train", fts_train, trgts_train, ("darkred", "darkblue"), "P"),
    ):
        fig = plt.figure(figsize=(6, 6))
        _scatter_classes(plt, fts, trgts, num_classes, colors, marker, 0.05,
                         f" {tag}")
        plt.grid()
        plt.title(
            f"{dim_reduc}; Data: {split}({tag}); Total explained variance: "
            f"{round(expl, 3)}; Epoch: {epoch}"
        )
        plt.legend()
        path = os.path.join(out_dir, f"{dim_reduc}_{split}({tag})_{epoch}.png")
        plt.savefig(path)
        plt.close(fig)
        paths.append(path)
    return tuple(paths)
