"""Inference / serving entry point.

The reference is a research codebase with no serving path (checkpoints are
only re-consumed by its analysis subsystems).  This module adds the
deployment-side counterpart: load a trained checkpoint once, batch incoming
cycles through the jitted forward at a fixed shape (pad-and-mask, so XLA
compiles a single program), and aggregate per-segment probabilities into
per-recording decisions exactly like the evaluation protocol
(train_model.py:621-646).

CLI:
  python -m pcgmix_tpu.serve --checkpoint runs/.../model.msgpack \
      --model resnet9 --dataset-file physionet.dat --split test
"""

from __future__ import annotations

import argparse
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Prediction:
    wav: str
    pred: int
    prob_abnormal: float
    num_segments: int


class Classifier:
    def __init__(self, model, params, batch_stats, batch_size: int = 256,
                 class_majority: bool = False):
        self.model = model
        self.params = params
        self.batch_stats = batch_stats
        self.batch_size = batch_size
        self.class_majority = class_majority

        @jax.jit
        def forward(data):
            out = model.apply({"params": params, "batch_stats": batch_stats}, data)
            return jax.nn.softmax(out, axis=1)

        self._forward = forward

    @classmethod
    def from_checkpoint(
        cls, path: str, model_name: str = "resnet9", dataset: str = "PhysioNet",
        num_channels: int = 4, sig_len: int = 2500, num_classes: int = 2,
        compute_dtype=None, **kw,
    ) -> "Classifier":
        from pcgmix_tpu.models import build_model
        from pcgmix_tpu.train.loop import load_checkpoint

        model = build_model(
            model_name, dataset, num_classes, train=False,
            compute_dtype=compute_dtype,
        )
        from pcgmix_tpu.models.registry import sample_input_shape

        shape = sample_input_shape(dataset, num_channels, sig_len)
        restored = load_checkpoint(path, model, shape)
        return cls(model, restored["params"], restored["batch_stats"], **kw)

    def predict_proba(self, data: np.ndarray) -> np.ndarray:
        """(N, …) cycles → (N, C) softmax probabilities; inputs are padded to
        the service batch size so every call hits one compiled program."""
        n = len(data)
        out = None
        bs = self.batch_size
        for b in range(0, n, bs):
            chunk = data[b : b + bs]
            valid = len(chunk)
            if valid < bs:
                pad = np.zeros((bs - valid,) + chunk.shape[1:], chunk.dtype)
                chunk = np.concatenate([chunk, pad])
            probs = np.asarray(self._forward(jnp.asarray(chunk)))
            if out is None:
                out = np.zeros((n, probs.shape[1]), np.float32)
            out[b : b + valid] = probs[:valid]
        return out if out is not None else np.zeros((0, 2), np.float32)

    def predict_recordings(self, data: np.ndarray, wavs) -> list[Prediction]:
        """Aggregate per-cycle probabilities into per-recording predictions —
        the evaluation protocol's shared aggregation
        (train.metrics.aggregate_recordings)."""
        from pcgmix_tpu.train.metrics import aggregate_recordings

        probs = self.predict_proba(data)
        agg = aggregate_recordings(probs, wavs, self.class_majority)
        return [
            Prediction(w, pred, float(mean[1]) if len(mean) > 1 else 0.0, n)
            for w, (pred, mean, n) in agg.items()
        ]


def main(argv=None):
    p = argparse.ArgumentParser(description="Classify recordings with a checkpoint")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--model", default="resnet9")
    p.add_argument("--dataset", default="PhysioNet")
    p.add_argument("--dataset-file", required=True)
    p.add_argument("--split", default="test", choices=["train", "test"])
    p.add_argument("--num-channels", type=int, default=4)
    p.add_argument("--class-majority", action="store_true")
    args = p.parse_args(argv)

    from pcgmix_tpu import utils
    from pcgmix_tpu.data.datasets import ArrayDataset

    d = utils.file2dict(args.dataset_file)
    split = d[args.split] if args.split in d else d
    ds = ArrayDataset.from_dict(
        split, args.num_channels, spectrogram=args.dataset.endswith(")")
        and "spec" in args.dataset,
    )
    clf = Classifier.from_checkpoint(
        args.checkpoint, args.model, args.dataset, args.num_channels,
        sig_len=ds.data.shape[-1], class_majority=args.class_majority,
    )
    preds = clf.predict_recordings(ds.data, ds.wav)
    for pr in preds:
        print(f"{pr.wav}\tpred={pr.pred}\tp_abnormal={pr.prob_abnormal:.4f}"
              f"\tsegments={pr.num_segments}")
    if ds.label is not None and len(ds.label):
        by_wav = {w: int(t) for w, t in zip(ds.wav, ds.label)}
        acc = np.mean([pr.pred == by_wav[pr.wav] for pr in preds]) * 100
        print(f"# recording accuracy vs labels: {acc:.2f}%")


if __name__ == "__main__":
    main()
