"""Inference CLI: restore a trained checkpoint and label a corpus.

    python -m sign_language_nlp_tpu.predict \
        --checkpoint <workdir-with-params.msgpack> \
        --dataset_dir <asl-phono-dir> [--out predictions.json]

The checkpoint descriptor carries the model class, resolved model args,
and both vocabularies (pipeline.py persists them after refit), so
prediction needs no access to the training corpus: new samples are
tokenized with the SAVED source vocab (unseen tokens → <unk>) and
predictions decode through the saved target vocab.

This is the serving-path counterpart of the reference's
`estimator.predict` usage (reference main.py:109-117), as a standalone
process.
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def load_predictor(checkpoint_dir: str):
    """Returns (model, params, src_vocab, tgt_vocab, descriptor)."""
    import jax

    from .data.vocab import Vocab
    from .models.registry import build_model
    from .training.checkpoint import load_checkpoint, load_descriptor

    desc = load_descriptor(checkpoint_dir)
    src_vocab = Vocab.from_itos(desc["src_vocab_itos"])
    tgt_vocab = Vocab.from_itos(desc["tgt_vocab_itos"])
    model = build_model(desc["model"], len(src_vocab), len(tgt_vocab),
                        src_vocab.pad_index, tgt_vocab.pad_index,
                        model_args=desc.get("model_args"),
                        compat_args=desc.get("compat_args"),
                        precision_args=desc.get("precision_args"))

    # Materialize a params template with the right structure:
    sample_tokens = np.full((1, 8), src_vocab.pad_index, np.int32)
    sample_tokens[0, 0] = 2 % len(src_vocab)
    template = jax.jit(model.init)(
        {"params": jax.random.key(0)}, sample_tokens,
        np.array([1], np.int32), np.array([2 % len(tgt_vocab)], np.int32))
    # Checkpoints carry a leading population axis [1, ...]:
    template = jax.tree.map(lambda a: np.asarray(a)[None], template)
    params = load_checkpoint(checkpoint_dir, template)
    params = jax.tree.map(lambda a: a[0], params)
    return model, params, src_vocab, tgt_vocab, desc


def predict_corpus(checkpoint_dir: str, dataset_dir: str, fields,
                   composition_strategy: str = "as_words",
                   batch_size: int = 256) -> dict:
    """Label every sample in `dataset_dir`; returns {filename: gloss}."""
    import jax
    import jax.numpy as jnp

    from .data.builder import DatasetBuilder
    from .data.dataset import AslDataset

    model, params, src_vocab, tgt_vocab, _ = load_predictor(checkpoint_dir)

    built = DatasetBuilder().build(dataset_dir=dataset_dir, fields=fields,
                                   samples_min_freq=1,
                                   composition_strategy=composition_strategy)
    ds = AslDataset.from_sequences(
        src=built["src"], tgt=[t[0] if t else "" for t in built["tgt"]],
        src_vocab=src_vocab, tgt_vocab=tgt_vocab)

    @jax.jit
    def fwd(tokens, lengths, y):
        return model.apply(params, tokens, lengths, y)

    preds = []
    n = len(ds)
    for start in range(0, n, batch_size):
        sl = slice(start, min(start + batch_size, n))
        # Pad the tail batch to the full batch size (static shapes):
        tok = ds.tokens[sl]
        ln = ds.lengths[sl]
        yy = ds.labels_idx[sl]
        pad = batch_size - len(tok)
        if pad:  # keep one static batch shape → one compile
            tok = np.concatenate([tok, np.repeat(tok[-1:], pad, 0)])
            ln = np.concatenate([ln, np.repeat(ln[-1:], pad, 0)])
            yy = np.concatenate([yy, np.repeat(yy[-1:], pad, 0)])
        out = np.asarray(fwd(tok, ln, yy))[: sl.stop - sl.start]
        preds.extend(int(i) for i in out.argmax(-1))

    itos = tgt_vocab.itos
    return {f: itos[p] for f, p in zip(built["files"], preds)}


def main(argv=None) -> None:
    import os

    if os.environ.get("SLT_FORCE_CPU") == "1":
        from .utils.jaxtools import force_cpu

        force_cpu()

    ap = argparse.ArgumentParser(prog="sign_language_nlp_tpu.predict")
    ap.add_argument("--checkpoint", required=True,
                    help="workdir containing params.msgpack/params.json")
    ap.add_argument("--dataset_dir", required=True)
    ap.add_argument("--fields", default="orientation_dh,orientation_ndh,"
                    "movement_dh,movement_ndh,handshape_dh,handshape_ndh")
    ap.add_argument("--composition_strategy", default="as_words")
    ap.add_argument("--out", default=None, help="output JSON (default "
                    "stdout)")
    args = ap.parse_args(argv)

    preds = predict_corpus(args.checkpoint, args.dataset_dir,
                           fields=args.fields.split(","),
                           composition_strategy=args.composition_strategy)
    payload = json.dumps(preds, indent=2, sort_keys=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(payload)
        print(f"wrote {len(preds)} predictions to {args.out}",
              file=sys.stderr)
    else:
        print(payload)


if __name__ == "__main__":
    main()
