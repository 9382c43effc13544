"""Inference entry: classify waveforms with a trained checkpoint.

Beyond-reference serving convenience (the reference repo stops at training —
its nine scripts have no way to USE a trained model):

    python -m audiobd_tpu infer --result badnets_smallcnn --wav a.wav b.wav
    python -m audiobd_tpu infer --result badnets_smallcnn --wav clips_dir/ --json
    python -m audiobd_tpu infer --result badnets_smallcnn --eval_clean

``--wav`` entries may be directories (recursively expanded to their .wav
files, sorted); ``--json`` switches to one JSON object per line for
scripting/serving pipelines.

Loads ``record/<result>/checkpoint``, rebuilds the model from its saved spec
(the spec's attack name fixes the MFCC front-end preset, so clips are
featurized exactly as in training: resample → 1 s trim/pad → device MFCC),
and prints per-clip top-k classes. ``--eval_clean`` scores the clean test
split from the run's npy cache as a checkpoint health check.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def parse_arguments():
    parser = argparse.ArgumentParser(description="Classify wav clips with a trained checkpoint")
    parser.add_argument("--result", type=str, required=True, help="record/<result> of the training run")
    parser.add_argument("--wav", type=str, nargs="*", default=None,
                        help="wav files (or directories, expanded recursively) to classify")
    parser.add_argument("--json", action="store_true",
                        help="machine-readable output: one JSON object per clip (or per eval)")
    parser.add_argument("--eval_clean", action="store_true",
                        help="score the run's cached clean test split instead")
    parser.add_argument("--top_k", type=int, default=3)
    parser.add_argument("--dataset", type=str, default=None, help="label-name table override")
    parser.add_argument("--batch_size", type=int, default=None,
                        help="eval batch size (default: the training batch size from the "
                             "checkpoint spec — batch-mean loss parity with the training log)")
    return parser.parse_args()


def _load(result: str, dataset: str | None):
    from audiobd_tpu.configs import make_config
    from audiobd_tpu.defend.common import load_bd_model

    spec_path = os.path.join("record", result, "checkpoint", "model_spec.json")
    if not os.path.exists(spec_path):
        raise FileNotFoundError(f"no checkpoint spec at {spec_path} — train a model first")
    with open(spec_path) as f:
        spec = json.load(f)
    kw = {"result": result, "model": spec["model"], "num_classes": spec["num_classes"]}
    # label table / clean cache location: CLI override > the dataset the
    # checkpoint was trained on > preset default (pre-round-4 checkpoints)
    if dataset or spec.get("dataset"):
        kw["dataset"] = dataset or spec["dataset"]
    if spec.get("batch_size"):
        kw["batch_size"] = spec["batch_size"]
    cfg = make_config(spec["attack"], **kw)
    model, variables, _ = load_bd_model(cfg)
    return cfg, model, variables


def _expand_wavs(entries: list[str]) -> list[str]:
    """--wav entries → concrete file list; directories recurse (sorted for
    stable output and stable wrap-pad bucketing across reruns)."""
    out: list[str] = []
    for e in entries:
        if os.path.isdir(e):
            hits = []
            for root, _, files in os.walk(e):
                hits.extend(os.path.join(root, f) for f in files if f.lower().endswith(".wav"))
            out.extend(sorted(hits))
        else:
            out.append(e)
    return out


def _featurize_files(cfg, paths: list[str]):
    """Files → (N, 1, F, M) device features via the training front-end."""
    import jax.numpy as jnp

    from audiobd_tpu.data.speech_commands import batched_mfcc_device, mfcc_params
    from audiobd_tpu.data.wavio import read_wav
    from audiobd_tpu.dsp import resample

    from audiobd_tpu.poison.device_prep import padded_size

    sr, t = cfg.dsp.sample_rate, cfg.dsp.sample_rate  # 1 s at the attack's rate
    rows = []
    for path in paths:
        wav, file_sr = read_wav(path)
        if file_sr != sr:
            wav = np.asarray(resample(jnp.asarray(wav), file_sr, sr))
        clip = np.zeros(t, np.float32)
        n = min(wav.shape[1], t)
        clip[:n] = wav[0, :n]
        rows.append(clip)
    # wrap-pad to a quantized bucket: over the tunneled backend every unique
    # clip count would otherwise pay a fresh ~20-60 s serving compile
    n = len(rows)
    rows.extend([rows[0]] * (padded_size(n, 2048) - n))
    feats = batched_mfcc_device(np.stack(rows), mfcc_params(cfg), use_pallas=cfg.dsp.use_pallas)
    return feats, n


def main():
    args = parse_arguments()
    from audiobd_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache("auto")
    cfg, model, variables = _load(args.result, args.dataset)
    labels = cfg.labels

    import jax

    @jax.jit
    def probs_fn(feats):
        logits = model.apply(variables, feats, train=False)
        return jax.nn.softmax(logits.astype(np.float32), axis=-1)

    if args.eval_clean:
        from types import SimpleNamespace

        from audiobd_tpu.data.speech_commands import clean_dir, load_clean_data
        from audiobd_tpu.train.loop import ArraySet, make_eval_step, run_eval

        # A health check must not silently fall through to a full dataset
        # rebuild (hours of wav decode + tunnel compiles) or crash opaquely
        # when neither cache nor wav tree exists.
        import os

        if not os.path.exists(os.path.join(clean_dir(cfg), "clean_train_mfcc.npy")):
            raise SystemExit(
                f"--eval_clean needs the clean npy cache at {clean_dir(cfg)} "
                "(run the attack CLI once, or prepare_clean_dataset, to build it)"
            )
        clean = load_clean_data(cfg, load=True)
        state = SimpleNamespace(params=variables["params"],
                                batch_stats=variables.get("batch_stats", {}))
        ev = run_eval(make_eval_step(model), state,
                      ArraySet(clean.test_mfcc, clean.test_label),
                      args.batch_size or cfg.train.batch_size)
        if args.json:
            print(json.dumps({"clean_test_acc": round(float(ev["acc"]), 4),
                              "clean_test_loss": round(float(ev["loss"]), 6),
                              "n_clips": int(len(clean.test_label))}))
        else:
            print(f"clean test: acc {ev['acc']:.2f}  loss {ev['loss']:.4f} "
                  f"({len(clean.test_label)} clips)")
        return ev

    if not args.wav:
        raise SystemExit("nothing to do: pass --wav files or --eval_clean")
    paths = _expand_wavs(args.wav)
    if not paths:
        raise SystemExit(f"no .wav files found under {args.wav}")
    feats, n = _featurize_files(cfg, paths)
    probs = np.asarray(probs_fn(feats))[:n]
    k = min(args.top_k, probs.shape[-1])
    for path, row in zip(paths, probs):
        top = np.argsort(row)[::-1][:k]
        if args.json:
            print(json.dumps({
                "path": path,
                "label": labels[top[0]] if top[0] < len(labels) else int(top[0]),
                "top": [{"label": labels[i] if i < len(labels) else int(i),
                         "prob": round(float(row[i]), 6)} for i in top],
            }))
        else:
            ranked = ", ".join(f"{labels[i] if i < len(labels) else i}={row[i]:.3f}" for i in top)
            print(f"{path}: {ranked}")
    return probs


if __name__ == "__main__":
    main()
