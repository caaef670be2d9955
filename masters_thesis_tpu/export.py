"""Serialized inference artifacts: freeze a trained run's decode program
into one portable StableHLO file (``jax.export``).

New TPU-native deployment surface — the reference has no serving or
deployment story at all (its eval.py writes npy files from the live
training code, AttemptFour/eval.py:147-193). ``mtt export`` bakes the
decode program AND the trained weights into a single artifact that serves
without any model code: loading needs only jax + the bundled tokenizer,
so a captioning endpoint can run from a checkout that contains neither
flax modules nor checkpoints.

Artifact layout (one zip):
    meta.json          version, decoder, shapes, platforms, provenance
    tokenizer.json     the run's tokenizer (Keras-compatible format)
    decode.stablehlo   jax.export serialization of decode(betas) -> words

The program has STATIC shapes (XLA contract): inputs are padded to the
exported ``batch_size`` exactly like ``serve.Captioner`` pads its service
batch. Multi-platform lowering (``platforms=("cpu", "tpu")``) makes one
artifact runnable on both a dev host and the serving slice.
"""

from __future__ import annotations

import json
import os
import zipfile

import numpy as np

ARTIFACT_VERSION = 1
_META = "meta.json"
_TOKENIZER = "tokenizer.json"
_PROGRAM = "decode.stablehlo"


def _chain_as_jax(pre_dir: str):
    """The preprocess transform chain (vc mask -> normalize -> pca) as a
    pure jax function over raw rows, plus the raw input shape it expects.

    Every stage is a constant-folded jax op (gather / affine / matmul), so
    ``export --pre`` bakes the chain INTO the artifact: one file takes the
    RAW betas the offline pipeline started from."""
    import json as _json

    import jax.numpy as jnp
    import numpy as np

    from masters_thesis_tpu.data.preprocess.pca import PCAModel

    with open(os.path.join(pre_dir, "transform.json")) as f:
        meta = _json.load(f)
    stages = []
    for st in meta["stages"]:
        path = os.path.join(pre_dir, st["file"])
        if st["stage"] == "vc_mask":
            mask = jnp.asarray(np.load(path))
            stages.append(lambda x, m=mask: jnp.take(x, m, axis=1))
        elif st["stage"] == "normalize":
            d = np.load(path)
            mean, std = jnp.asarray(d["mean"]), jnp.asarray(d["std"])
            stages.append(lambda x, m=mean, s=std: (x - m) / s)
        elif st["stage"] == "pca":
            p = PCAModel.load(path)
            mean, comps = jnp.asarray(p.mean), jnp.asarray(p.components)
            stages.append(lambda x, m=mean, c=comps: (x - m) @ c.T)
        else:
            raise ValueError(f"unknown transform stage {st['stage']!r}")

    def chain(x):
        for fn in stages:
            x = fn(x)
        return x

    raw_shape = meta.get("input_row_shape")
    if not raw_shape:
        raise ValueError(
            f"{pre_dir!r}/transform.json records no input_row_shape — "
            "re-run mtt preprocess to refresh it")
    return chain, tuple(int(d) for d in raw_shape), \
        [s["stage"] for s in meta["stages"]]


def export_run(run_path: str, out_path: str, decoder: str = "greedy",
               batch_size: int = 64, beam_width: int = 5,
               platforms=None, best: bool = True,
               subject: str = "a", pre: str | None = None) -> dict:
    """Export a trained run's decode path to ``out_path``; returns meta.

    ``platforms``: sequence of lowering targets (e.g. ``("cpu", "tpu")``);
    None lowers for the current backend only. Weights ride inside the
    program as constants — the artifact is self-contained. ``subject``:
    which per-subject encoder an ms2_nic artifact freezes (one artifact
    per subject, like eval/serving). ``pre``: a preprocess output dir whose
    transform chain is baked into the program — the artifact then takes the
    RAW rows the offline pipeline started from.
    """
    import jax
    import jax.export as jax_export
    import jax.numpy as jnp

    from masters_thesis_tpu.serve import Captioner

    # the Pallas fused path is a runtime specialisation, not a portable
    # program — export always freezes the XLA scan decoders
    cap = Captioner.from_run_dir(run_path, best=best, batch_size=batch_size,
                                 beam_width=beam_width, use_fused=False,
                                 subject=subject)
    model, variables, tok = cap.model, cap.variables, cap.tokenizer
    from masters_thesis_tpu.models.multisubject import DualSubjectEncoder

    is_ms2 = isinstance(getattr(model, "encoder", None), DualSubjectEncoder)
    if not is_ms2 and subject != "a":
        # from_run_dir silently drops the kwarg for single-encoder models;
        # an artifact whose meta claimed subject=b would be a lie
        raise ValueError(
            f"run {run_path!r} is not an ms2_nic run; --subject does not "
            "apply"
        )
    width = cap.input_width
    if width is None:
        raise ValueError(
            f"run {run_path!r} has no recorded input width (layout.npz / "
            "config input dim) — cannot fix the exported input shape"
        )

    chain, chain_stages = (lambda x: x), []
    row_shape = cap.input_row_shape or (width,)
    if pre:
        chain, raw_shape, chain_stages = _chain_as_jax(pre)
        row_shape = raw_shape
        width = raw_shape[-1]

    if decoder == "greedy":
        from masters_thesis_tpu.decode.greedy import make_greedy_decoder

        dec = make_greedy_decoder(model, cap.units, cap.max_length)

        def fn(betas):
            words, _, _ = dec(variables, chain(betas), tok.start_id)
            return words
    elif decoder == "beam":
        from masters_thesis_tpu.decode.beam import make_beam_decoder

        dec = make_beam_decoder(model, cap.units, cap.max_length,
                                beam_width=beam_width)

        def fn(betas):
            best_tokens, *_ = dec(variables, chain(betas),
                                  tok.start_id, tok.end_id)
            return best_tokens
    else:
        raise ValueError(
            f"unknown decoder {decoder!r} (greedy|beam; sampling draws "
            "fresh RNG per call and is not a fixed program)"
        )

    spec = jax.ShapeDtypeStruct((cap.batch_size, *row_shape), jnp.float32)
    kw = {"platforms": list(platforms)} if platforms else {}
    exported = jax_export.export(jax.jit(fn), **kw)(spec)
    blob = exported.serialize()

    meta = {
        "version": ARTIFACT_VERSION,
        "decoder": decoder,
        "batch_size": int(cap.batch_size),
        "input_width": int(width),
        "input_row_shape": [int(d) for d in row_shape],
        "max_length": int(cap.max_length),
        "vocab_size": int(model.vocab_size),
        "beam_width": int(beam_width) if decoder == "beam" else None,
        "platforms": list(exported.platforms),
        "run_path": os.path.abspath(run_path),
        "subject": subject if is_ms2 else None,
        "pre_stages": chain_stages,  # transform chain baked into the program
    }
    with open(os.path.join(run_path, "tokenizer.json")) as f:
        tok_json = f.read()
    tmp = f"{out_path}.tmp-{os.getpid()}"
    try:
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
            z.writestr(_META, json.dumps(meta, indent=1))
            z.writestr(_TOKENIZER, tok_json)
            z.writestr(_PROGRAM, blob)
        os.replace(tmp, out_path)  # atomic: no truncated artifacts
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return meta


class ExportedCaptioner:
    """Serve captions from an exported artifact — no model code needed.

    Same padding contract as ``serve.Captioner``: any request size runs
    through the one compiled batch shape.
    """

    def __init__(self, exported, tokenizer, meta: dict):
        self._exported = exported
        self.tokenizer = tokenizer
        self.meta = meta
        self.batch_size = meta["batch_size"]
        self.input_width = meta["input_width"]
        # full per-row shape (patch artifacts are (patches, channels));
        # pre-row_shape artifacts fall back to the flat width
        self.input_row_shape = tuple(
            meta.get("input_row_shape") or (meta["input_width"],))

    def _check_decoder(self, decoder):
        if decoder is not None and decoder != self.meta["decoder"]:
            raise ValueError(
                f"this artifact freezes the {self.meta['decoder']!r} "
                f"decoder; cannot serve decoder={decoder!r}"
            )

    def caption_ids(self, inputs: np.ndarray,
                    decoder: str | None = None) -> np.ndarray:
        import jax.numpy as jnp

        from masters_thesis_tpu.serve import padded_chunk_ids

        self._check_decoder(decoder)
        return padded_chunk_ids(
            inputs, self.batch_size, self.meta["max_length"],
            self.input_width,
            lambda chunk: self._exported.call(jnp.asarray(chunk)),
        )

    def caption(self, inputs: np.ndarray,
                decoder: str | None = None) -> list[str]:
        from masters_thesis_tpu.evalsuite.tokens import ids_to_caption

        return [ids_to_caption(row, self.tokenizer)
                for row in self.caption_ids(inputs, decoder)]


def load_exported(path: str) -> ExportedCaptioner:
    import jax.export as jax_export

    from masters_thesis_tpu.data.tokenizer import Tokenizer

    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read(_META))
        if meta.get("version") != ARTIFACT_VERSION:
            raise ValueError(
                f"artifact {path!r} has version {meta.get('version')}; "
                f"this build reads version {ARTIFACT_VERSION}"
            )
        tok = Tokenizer.from_json(z.read(_TOKENIZER).decode())
        exported = jax_export.deserialize(bytearray(z.read(_PROGRAM)))
    return ExportedCaptioner(exported, tok, meta)
