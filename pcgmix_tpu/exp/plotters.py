"""Run-directory plots (SURVEY.md §2 component 14 / §5 observability).

Functional equivalents of plotters.py: per-run accuracy/loss/lr/times jpgs,
variability growth, per-epoch loss histograms with a 2-component Gaussian
mixture fit.  All host-side matplotlib (Agg).
"""

from __future__ import annotations

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pcgmix_tpu import utils


def _save(fig, path: str) -> str:
    fig.savefig(path)
    plt.close(fig)
    return path


def plot_train_test_acc(acc_train, acc_test, valid, steps, run_dir) -> str:
    """Accuracy curves with max/final test markers (plotters.py:88-107)."""
    label = "valid" if valid else "test"
    color = "royalblue" if valid else "forestgreen"
    best = float(np.max(acc_test))
    best_step = steps[int(np.argmax(acc_test))]
    fig = plt.figure(figsize=(6, 6))
    plt.plot(steps, acc_train, label="train", color="darkorange")
    plt.plot(steps, acc_test, label=label, color=color)
    plt.axhline(
        best, color=color, linestyle="--",
        label=f"{label} max {best:.2f} @step {best_step}",
    )
    plt.axhline(
        acc_test[-1], color=color, linestyle="-.",
        label=f"{label} final {acc_test[-1]:.2f}",
    )
    plt.ylim(0, 110)
    plt.xlabel("Steps")
    plt.ylabel("Accuracy [%]")
    plt.legend()
    plt.grid()
    return _save(fig, os.path.join(run_dir, "accuracy.jpg"))


def plot_train_test_loss(loss_train, loss_test, valid, steps, run_dir) -> str:
    """Loss curves (plotters.py:109-126)."""
    label = "valid" if valid else "test"
    color = "royalblue" if valid else "forestgreen"
    fig = plt.figure(figsize=(6, 6))
    plt.plot(steps, loss_train, label="train", color="darkorange")
    plt.axhline(loss_train[-1], color="darkorange", linestyle="-.",
                label=f"train final {loss_train[-1]:.2f}")
    plt.plot(steps, loss_test, label=label, color=color)
    plt.axhline(loss_test[-1], color=color, linestyle="-.",
                label=f"{label} final {loss_test[-1]:.2f}")
    plt.xlabel("Step")
    plt.ylabel("Loss")
    plt.legend()
    plt.grid()
    return _save(fig, os.path.join(run_dir, "loss.jpg"))


def plot_lr_per_step(lr_per_step, run_dir) -> str:
    """Learning-rate trajectory (plotters.py:171-187)."""
    fig = plt.figure(figsize=(6, 6))
    plt.plot(np.arange(1, len(lr_per_step) + 1), lr_per_step,
             label="learning_rate", color="k")
    plt.ylim(bottom=0)
    plt.xlabel("Step")
    plt.ylabel("Learning rate")
    plt.legend()
    plt.grid()
    return _save(fig, os.path.join(run_dir, "learning_rate.jpg"))


def plot_times(times, steps, run_dir) -> str:
    """Per-epoch wall-clock with a total in the title (plotters.py:150-169)."""
    total = float(np.sum(times))
    fig = plt.figure(figsize=(6, 6))
    plt.plot(steps, times, label="times", color="k")
    plt.ylim(bottom=0)
    plt.xlabel("Steps")
    plt.ylabel("times [s]")
    plt.title("Total " + utils.timer(0.0, total))
    plt.legend()
    plt.grid()
    return _save(fig, os.path.join(run_dir, "times.jpg"))


def plot_variability(variability_counter, run_dir) -> str:
    """Cumulative unique base/pair/(pair,cut) counts on a log axis, plus the
    variability.pkl dump (plotters.py:128-148)."""
    vc = variability_counter
    fig = plt.figure(figsize=(6, 6))
    plt.plot(vc.steps, vc.lens_base, label="base", color="darkorange")
    plt.axhline(vc.base_original, label="base_original", color="darkorange",
                linestyle="--")
    plt.plot(vc.steps, vc.lens_pairs, label="pairs", color="forestgreen")
    plt.plot(vc.steps, vc.lens_unique, label="unique", color="purple",
             linestyle="--")
    plt.xlabel("Steps")
    plt.ylabel("Cumulative samples")
    plt.yscale("log")
    plt.legend()
    plt.grid()
    utils.save_dict(
        {"base": vc.lens_base, "pairs": vc.lens_pairs, "unique": vc.lens_unique,
         "steps": vc.steps},
        os.path.join(run_dir, "variability.pkl"),
    )
    return _save(fig, os.path.join(run_dir, "variability.jpg"))


def plot_wav_predprobas(pred_dict, wav_targets_dict, epoch, run_dir) -> str:
    """Per-recording mean abnormal-probability bars, colored by correctness
    (plot_wav_predprobas_boxplot, train_model.py:690-729)."""
    wav_sorted = sorted(wav_targets_dict, key=lambda k: wav_targets_dict[k])
    labels = [wav_targets_dict[w] for w in wav_sorted]
    means = [float(np.mean([p[1] for p in pred_dict[w]])) for w in wav_sorted]
    thresh = 0.5
    colors = [
        "green" if (l == 1) == (m >= thresh) else "red"
        for l, m in zip(labels, means)
    ]
    n_normal = labels.count(0)
    fig = plt.figure(figsize=(45, 5))
    xs = np.arange(len(wav_sorted))
    plt.bar(xs, means, width=0.8, color=colors)
    plt.axhline(y=thresh, color="k")
    if 0 < n_normal < len(xs):
        plt.axvline(x=xs[n_normal - 1] + 0.5, color="k")
    plt.xticks(xs, [f"{w}_{l}" for w, l in zip(wav_sorted, labels)], rotation=90)
    plt.ylabel("Mean abnormal prediction probability")
    plt.ylim(0, 1)
    plt.tight_layout()
    d = utils.check_folder(os.path.join(run_dir, "test_wav_predprobas"))
    return _save(fig, os.path.join(d, f"test_wav_predprobas_{epoch}.jpg"))


def plot_epoch_loss(loss_correct, loss_incorrect, epoch, run_dir) -> str:
    """Histogram of normalized per-sample losses, correct vs incorrect
    (plotters.py:19-40)."""
    all_losses = np.append(loss_correct, loss_incorrect)
    peak = np.max(all_losses) if len(all_losses) else 1.0
    bins = np.linspace(0, 1, 100)
    fig = plt.figure(figsize=(6, 6))
    plt.hist(loss_correct / peak, bins, alpha=0.5, label="correct",
             color="royalblue")
    plt.hist(loss_incorrect / peak, bins, alpha=0.5, label="incorrect",
             color="crimson")
    plt.title(f"Epoch={epoch}")
    plt.xlabel("normalized loss")
    plt.ylabel("#samples")
    plt.legend()
    plt.grid()
    d = utils.check_folder(os.path.join(run_dir, "losses"))
    return _save(fig, os.path.join(d, f"epoch_loss_{epoch}.jpg"))


def plot_epoch_loss_gmm(loss_correct, loss_incorrect, epoch, run_dir) -> float:
    """2-component Gaussian-mixture fit over normalized losses; returns
    |μ₁−μ₂| (plotters.py:45-86)."""
    from sklearn import mixture

    all_losses = np.append(loss_correct, loss_incorrect).astype(np.float64)
    peak = np.max(all_losses) if len(all_losses) else 1.0
    normed = (all_losses / peak).reshape(-1, 1)
    gm = mixture.GaussianMixture(n_components=2, random_state=4).fit(normed)
    means = gm.means_.ravel()
    xs = np.linspace(0, 1, 100)
    fig = plt.figure(figsize=(6, 6))
    plt.hist(normed.ravel(), xs, alpha=0.5, density=True, color="grey")
    plt.plot(xs, np.exp(gm.score_samples(xs.reshape(-1, 1))), color="k",
             label="gaussian mixture")
    for m in means:
        plt.axvline(m, linestyle="--", color="k", alpha=0.8)
    plt.title(f"epoch {epoch};   |mu1 - mu2| = {abs(means[1] - means[0]):.2f}")
    plt.xlabel("normalized loss")
    plt.ylabel("probability density")
    plt.legend()
    plt.grid()
    d = utils.check_folder(os.path.join(run_dir, "losses"))
    _save(fig, os.path.join(d, f"epoch_loss_dst_{epoch}.jpg"))
    return float(abs(means[1] - means[0]))


def plot_m1(gmm_m1s, run_dir) -> str:
    """M₁ (GMM mean-separation) trajectory over epochs with the maximum
    marked (plotters.py:189-207) → m1.jpg.  gmm_m1s: one
    plot_epoch_loss_gmm return value per epoch."""
    m1s = [float(v) for v in gmm_m1s]
    epochs = np.arange(1, len(m1s) + 1)
    m1_max = max(m1s)
    epoch_max = int(epochs[m1s.index(m1_max)])
    fig = plt.figure(figsize=(6, 6))
    plt.plot(epochs, m1s, label=r"$M_1$", color="rebeccapurple")
    plt.scatter(epoch_max, m1_max, color="k", label=f"max@epoch {epoch_max}")
    plt.ylim(bottom=0)
    plt.xlabel("Epoch")
    plt.ylabel(r"$M_1$")
    plt.legend()
    plt.grid()
    return _save(fig, os.path.join(run_dir, "m1.jpg"))
