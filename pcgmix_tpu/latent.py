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

import os
import jax
import jax.numpy as jnp
import numpy as np

from pcgmix_tpu import utils


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


def save_latent_space(dct: dict, split: str, step: int, results_dir: str) -> None:
    """Dump a {'fts', 'target'} dict to latent_space/latent_space_<split>_<step>.pkl
    (latent_space.py:49-52)."""
    d = utils.check_folder(os.path.join(results_dir, "latent_space"))
    utils.save_dict(dct, os.path.join(d, f"latent_space_{split}_{step}.pkl"))


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
    return (
        pca.transform(fts),
        pca.transform(fts_new),
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
