"""Serving API: load a trained run and caption brain data in one call.

The reference has no serving surface (eval.py writes npy files); this gives
framework users a programmatic path:

    cap = Captioner.from_components(model, params, batch_stats, tokenizer)
    texts = cap.caption(betas)                       # greedy
    texts = cap.caption(betas, decoder="beam")       # beam-5, length-norm

Decode programs are compiled once per (decoder, batch-shape) and cached; the
batch is padded to the compiled shape so arbitrary request sizes reuse one
executable (static shapes — XLA requirement).
"""

from __future__ import annotations

import numpy as np

from masters_thesis_tpu.evalsuite.tokens import ids_to_caption


class Captioner:
    def __init__(self, model, variables, tokenizer, units: int,
                 max_length: int, batch_size: int = 64, beam_width: int = 5):
        self.model = model
        self.variables = variables
        self.tokenizer = tokenizer
        self.units = units
        self.max_length = max_length
        self.batch_size = batch_size
        self.beam_width = beam_width
        self._decoders: dict = {}

    @classmethod
    def from_components(cls, model, params, batch_stats, tokenizer, units,
                        max_length, **kw) -> "Captioner":
        return cls(
            model, {"params": params, "batch_stats": batch_stats}, tokenizer,
            units, max_length, **kw,
        )

    def _decoder(self, kind: str):
        if kind not in self._decoders:
            if kind == "greedy":
                from masters_thesis_tpu.decode.greedy import make_greedy_decoder

                self._decoders[kind] = make_greedy_decoder(
                    self.model, self.units, self.max_length
                )
            elif kind == "beam":
                from masters_thesis_tpu.decode.beam import make_beam_decoder

                self._decoders[kind] = make_beam_decoder(
                    self.model, self.units, self.max_length,
                    beam_width=self.beam_width,
                )
            else:
                raise ValueError(f"unknown decoder {kind!r}")
        return self._decoders[kind]

    def caption_ids(self, inputs: np.ndarray, decoder: str = "greedy"):
        """(N, D) inputs -> (N, T) token ids; pads to the service batch."""
        import jax.numpy as jnp

        inputs = np.asarray(inputs, np.float32)
        n = len(inputs)
        out = []
        bs = self.batch_size
        for i in range(0, n, bs):
            chunk = inputs[i : i + bs]
            pad = bs - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], pad, axis=0)]
                )
            dec = self._decoder(decoder)
            if decoder == "greedy":
                words, _, _ = dec(
                    self.variables, jnp.asarray(chunk), self.tokenizer.start_id
                )
            else:
                words, _, _, _ = dec(
                    self.variables, jnp.asarray(chunk),
                    self.tokenizer.start_id, self.tokenizer.end_id,
                )
            words = np.asarray(words)
            out.append(words[: len(words) - pad] if pad else words)
        return np.concatenate(out)

    def caption(self, inputs: np.ndarray, decoder: str = "greedy") -> list[str]:
        ids = self.caption_ids(inputs, decoder)
        return [ids_to_caption(row, self.tokenizer) for row in ids]
