"""Inference / serving entry point.

The reference is a research codebase with no serving path (checkpoints are
only re-consumed by its analysis subsystems).  This module adds the
deployment-side counterpart: load a trained checkpoint once, batch incoming
cycles through the jitted forward at a fixed shape (pad-and-mask, so XLA
compiles a single program), and aggregate per-segment probabilities into
per-recording decisions exactly like the evaluation protocol
(train_model.py:621-646).

Two serving modes:

- **Live** (`Classifier`): restore a flax msgpack checkpoint + rebuild the
  model in Python, jit the forward.
- **Artifact** (`ExportedClassifier`): a single self-contained file produced
  by `Classifier.export_artifact` — the forward pass serialized as versioned
  StableHLO via `jax.export` with the trained weights baked in as
  constants.  Deployment needs no model code, no checkpoint format, and no
  pcgmix source beyond this module; multi-platform artifacts
  (``platforms=("cpu", "tpu")``) run on either backend.

CLI:
  python -m pcgmix_tpu.serve --checkpoint runs/.../model.msgpack \
      --model resnet9 --dataset-file physionet.dat --split test
  python -m pcgmix_tpu.serve --checkpoint ... --model resnet9 \
      --sig-len 2500 --export-to model.pcgx --platforms cpu,tpu
  python -m pcgmix_tpu.serve --artifact model.pcgx \
      --dataset-file physionet.dat --split test
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import struct

import jax
import jax.numpy as jnp
import numpy as np

# Artifact container: magic + u32 LE header length + JSON header + payload.
_ARTIFACT_MAGIC = b"PCGXSHLO"
_ARTIFACT_FORMAT = 1


@dataclasses.dataclass
class Prediction:
    wav: str
    pred: int
    prob_abnormal: float
    num_segments: int


class _BatchedPredictor:
    """Shared pad-to-fixed-batch inference + recording aggregation.

    Subclasses provide ``self._forward`` ((batch_size, …) -> (batch_size, C)
    softmax probabilities), ``self.batch_size``, ``self.class_majority`` and
    ``self.num_classes``.
    """

    batch_size: int
    class_majority: bool
    num_classes: int = 2

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
        return (out if out is not None
                else np.zeros((0, self.num_classes), np.float32))

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


class Classifier(_BatchedPredictor):
    def __init__(self, model, params, batch_stats, batch_size: int = 256,
                 class_majority: bool = False, num_classes: int = 2):
        self.model = model
        self.params = params
        self.batch_stats = batch_stats
        self.batch_size = batch_size
        self.class_majority = class_majority
        self.num_classes = num_classes

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
        return cls(model, restored["params"], restored["batch_stats"],
                   num_classes=num_classes, **kw)

    def export_artifact(
        self, path: str, input_shape: tuple[int, ...],
        platforms: tuple[str, ...] | None = None,
        model_name: str = "", dtype=jnp.float32,
    ) -> dict:
        """Serialize the batched forward (weights baked in) as a
        self-contained StableHLO artifact at ``path``.

        ``input_shape`` is the per-sample shape — (C, L) for 1-D, (1, S, S)
        for spectrograms; the exported program's batch dimension is this
        classifier's ``batch_size`` (the pad-and-batch protocol keeps every
        call at that one shape).  ``platforms=None`` exports for the current
        backend only; pass e.g. ``("cpu", "tpu")`` for a multi-platform
        artifact.  Returns the header dict that was written.
        """
        from jax import export as jax_export

        spec = jax.ShapeDtypeStruct((self.batch_size, *input_shape), dtype)
        exported = jax_export.export(
            self._forward, platforms=platforms
        )(spec)
        payload = bytes(exported.serialize())
        header = {
            "format": _ARTIFACT_FORMAT,
            "model": model_name,
            "batch_size": self.batch_size,
            "input_shape": list(input_shape),
            "dtype": np.dtype(dtype).name,
            "num_classes": int(exported.out_avals[0].shape[-1]),
            "platforms": list(exported.platforms),
            "class_majority": bool(self.class_majority),
        }
        blob = json.dumps(header, sort_keys=True).encode("utf-8")
        with open(path, "wb") as f:
            f.write(_ARTIFACT_MAGIC)
            f.write(struct.pack("<I", len(blob)))
            f.write(blob)
            f.write(payload)
        return header


class ExportedClassifier(_BatchedPredictor):
    """Serve from a StableHLO artifact written by
    :meth:`Classifier.export_artifact` — no model code or checkpoint needed."""

    def __init__(self, path: str, class_majority: bool | None = None):
        from jax import export as jax_export

        with open(path, "rb") as f:
            magic = f.read(len(_ARTIFACT_MAGIC))
            if magic != _ARTIFACT_MAGIC:
                raise ValueError(f"{path}: not a pcgmix serving artifact")
            head = f.read(4)
            if len(head) < 4:
                raise ValueError(f"{path}: truncated serving artifact header")
            (hlen,) = struct.unpack("<I", head)
            blob = f.read(hlen)
            if len(blob) < hlen:
                raise ValueError(f"{path}: truncated serving artifact header")
            try:
                self.header = json.loads(blob.decode("utf-8"))
            except (UnicodeDecodeError, json.JSONDecodeError) as e:
                raise ValueError(
                    f"{path}: corrupt serving artifact header ({e})"
                ) from e
            payload = f.read()
        if self.header.get("format") != _ARTIFACT_FORMAT:
            raise ValueError(
                f"{path}: unsupported artifact format {self.header.get('format')}"
            )
        self._exported = jax_export.deserialize(bytearray(payload))
        # Exported.call retraces on every eager invocation (~1 ms/call);
        # jitting it once caches the trace across predict_proba batches.
        self._call = jax.jit(self._exported.call)
        self.batch_size = int(self.header["batch_size"])
        self.input_shape = tuple(self.header["input_shape"])
        self.dtype = np.dtype(self.header["dtype"])
        self.num_classes = int(self.header.get("num_classes", 2))
        self.class_majority = (
            bool(self.header["class_majority"])
            if class_majority is None else class_majority
        )

    def predict_proba(self, data: np.ndarray) -> np.ndarray:
        if tuple(data.shape[1:]) != self.input_shape:
            raise ValueError(
                f"data shape {tuple(data.shape[1:])} does not match the "
                f"artifact's input shape {self.input_shape} "
                f"(model {self.header.get('model') or 'unknown'})"
            )
        return super().predict_proba(data)

    def _forward(self, data):
        return self._call(jnp.asarray(data, self.dtype))


def main(argv=None):
    from pcgmix_tpu import utils as _utils

    _utils.enable_compile_cache()  # warm-start tunnel compiles
    p = argparse.ArgumentParser(description="Classify recordings with a checkpoint")
    p.add_argument("--checkpoint", help="flax msgpack checkpoint (live mode)")
    p.add_argument("--artifact", help="StableHLO artifact (.pcgx) to serve from")
    p.add_argument("--model", default="resnet9")
    p.add_argument("--dataset", default="PhysioNet")
    p.add_argument("--dataset-file", help="packed dataset dict to classify")
    p.add_argument("--split", default="test", choices=["train", "test"])
    p.add_argument("--num-channels", type=int, default=4)
    p.add_argument("--class-majority", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="majority-vote recording aggregation; with "
                        "--artifact the default comes from the artifact "
                        "header (--no-class-majority overrides it off)")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--export-to", metavar="PATH",
                   help="write a StableHLO serving artifact and exit")
    p.add_argument("--sig-len", type=int, default=2500,
                   help="1-D cycle length for --export-to (ignored with "
                        "--dataset-file, which fixes the shape)")
    p.add_argument("--platforms",
                   help="comma-separated export platforms, e.g. cpu,tpu "
                        "(default: current backend only)")
    args = p.parse_args(argv)

    if args.artifact and (args.checkpoint or args.export_to):
        p.error("--artifact replaces --checkpoint and cannot be re-exported")
    if not args.artifact and not args.checkpoint:
        p.error("one of --checkpoint or --artifact is required")
    if not args.export_to and not args.dataset_file:
        p.error("--dataset-file is required unless --export-to is given")

    from pcgmix_tpu import utils
    from pcgmix_tpu.data.datasets import ArrayDataset
    from pcgmix_tpu.models.registry import sample_input_shape

    ds = None
    if args.dataset_file:
        d = utils.file2dict(args.dataset_file)
        split = d[args.split] if args.split in d else d
        ds = ArrayDataset.from_dict(
            split, args.num_channels, spectrogram=args.dataset.endswith(")")
            and "spec" in args.dataset,
        )

    sig_len = ds.data.shape[-1] if ds is not None else args.sig_len
    if args.artifact:
        clf = ExportedClassifier(
            args.artifact, class_majority=args.class_majority,
        )
    else:
        clf = Classifier.from_checkpoint(
            args.checkpoint, args.model, args.dataset, args.num_channels,
            sig_len=sig_len, class_majority=bool(args.class_majority),
            batch_size=args.batch_size,
        )

    if args.export_to:
        input_shape = tuple(
            sample_input_shape(args.dataset, args.num_channels, sig_len)[1:]
        )
        platforms = (
            tuple(s.strip() for s in args.platforms.split(",") if s.strip())
            if args.platforms else None
        )
        header = clf.export_artifact(
            args.export_to, input_shape, platforms=platforms,
            model_name=args.model,
        )
        print(f"# exported {args.export_to}: {json.dumps(header, sort_keys=True)}")
        if ds is None:
            return

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
