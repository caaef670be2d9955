"""Serving API: load a trained run and caption brain data in one call.

The reference has no serving surface (eval.py writes npy files); this gives
framework users a programmatic path:

    cap = Captioner.from_components(model, params, batch_stats, tokenizer)
    texts = cap.caption(betas)                       # greedy
    texts = cap.caption(betas, decoder="beam")       # beam-5, length-norm
    texts = cap.caption(betas, decoder="sample")     # categorical sampling

Decode programs are compiled once per (decoder, batch-shape) and cached; the
batch is padded to the compiled shape so arbitrary request sizes reuse one
executable (static shapes — XLA requirement).
"""

from __future__ import annotations

import numpy as np

from masters_thesis_tpu.evalsuite.tokens import ids_to_caption


def padded_chunk_ids(inputs, batch_size: int, max_length: int,
                     input_width: int | None, run_chunk) -> np.ndarray:
    """The static-shape serving contract, shared by ``Captioner`` and
    ``export.ExportedCaptioner``: validate the feature width, pad the last
    chunk to ``batch_size`` by repeating its final row (XLA programs have
    one compiled shape), run each chunk, slice the padding back off.

    ``run_chunk((batch_size, ...)) -> (batch_size, T) ids``. Empty input
    returns a (0, max_length) matrix (a request whose rows were all
    filtered upstream must not reach ``np.concatenate([])``).
    """
    inputs = np.asarray(inputs, np.float32)
    if input_width is not None and inputs.shape[-1] != input_width:
        raise ValueError(
            f"input width {inputs.shape[-1]} != model's expected "
            f"{input_width} voxels/features"
        )
    n = len(inputs)
    if n == 0:
        return np.zeros((0, max_length), np.int32)
    out = []
    for i in range(0, n, batch_size):
        chunk = inputs[i:i + batch_size]
        pad = batch_size - len(chunk)
        if pad:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], pad, axis=0)]
            )
        words = np.asarray(run_chunk(chunk))
        out.append(words[: len(words) - pad] if pad else words)
    return np.concatenate(out)


class PreTransformCaptioner:
    """Wrap a captioner so every request replays a preprocess transform
    chain first (``mtt serve/caption --pre``): the service then takes the
    RAW rows the offline pipeline started from, and the chain's recorded
    raw shape becomes the service's input contract."""

    def __init__(self, captioner, pre_dir: str):
        import json
        import os

        self.inner = captioner
        self.pre_dir = pre_dir
        with open(os.path.join(pre_dir, "transform.json")) as f:
            meta = json.load(f)
        raw = meta.get("input_row_shape")
        self.input_row_shape = tuple(raw) if raw else None
        self.input_width = (self.input_row_shape[-1]
                            if self.input_row_shape else None)

    def _transform(self, inputs):
        from masters_thesis_tpu.experiment import apply_preprocess_chain

        return apply_preprocess_chain(self.pre_dir, inputs)

    def caption(self, inputs, decoder: str = "greedy"):
        return self.inner.caption(self._transform(inputs), decoder=decoder)

    def caption_ids(self, inputs, decoder: str = "greedy"):
        return self.inner.caption_ids(self._transform(inputs),
                                      decoder=decoder)


class Captioner:
    def __init__(self, model, variables, tokenizer, units: int,
                 max_length: int, batch_size: int = 64, beam_width: int = 5,
                 input_width: int | None = None,
                 use_fused: bool | None = None, mesh=None,
                 temperature: float = 1.0, sample_top_k: int = 0,
                 seed: int = 0):
        self.model = model
        self.variables = variables
        self.tokenizer = tokenizer
        self.units = units
        self.max_length = max_length
        self.beam_width = beam_width
        # XLA clamps out-of-bounds gathers, so a wrong-width input would
        # silently produce garbage captions — validate explicitly
        self.input_width = input_width
        # full per-row input shape (flat: (voxels,), image models:
        # (patches, channels)); from_run_dir fills the trained shape,
        # export uses it to fix the artifact's input spec
        self.input_row_shape = (
            (int(input_width),) if input_width is not None else None
        )
        # greedy fast path: the whole-decode Pallas kernel
        # (ops/fused_decode.py — measured >= XLA with identical tokens at
        # flagship shape). None = auto: on for every unsharded NIC-family
        # model on TPU — LSTM and GRU cells, learned-init carries, frozen
        # GloVe tables (_fused_eligible; round-5 family coverage).
        self.use_fused = use_fused
        # multi-chip serving: a jax.sharding.Mesh with a 'data' axis scales
        # the service batch across chips (pure DP — params replicated, batch
        # axis sharded, no cross-chip collectives in the decode program; the
        # reference has no parallelism at all, SURVEY.md §2.7). Decoders ride
        # the XLA scan paths (the Pallas kernel is single-chip).
        # stochastic decoding (decoder="sample": the CNN_RNN evaluate loop's
        # tf.random.categorical per step, CNN_RNN/train.py:343-369)
        self.temperature = temperature
        self.sample_top_k = sample_top_k
        self._seed = seed
        self._sample_calls = 0
        self.mesh = mesh
        if mesh is not None:
            if "data" not in mesh.axis_names:
                raise ValueError(
                    f"sharded serving needs a 'data' mesh axis, got "
                    f"{mesh.axis_names} (build one with "
                    "parallel.mesh.make_mesh)"
                )
            if use_fused:
                raise ValueError(
                    "use_fused=True is incompatible with mesh serving: the "
                    "whole-decode Pallas kernel is single-chip; drop "
                    "use_fused or the mesh"
                )
            ndata = mesh.shape["data"]
            # each chip must hold equal batch rows (GSPMD even-sharding)
            batch_size = -(-batch_size // ndata) * ndata
            self._placed_vars = None
        self.batch_size = batch_size
        self._decoders: dict = {}

    def _fused_eligible(self) -> bool:
        import jax

        from masters_thesis_tpu.models.nic import NIC

        if self.use_fused is not None and self.mesh is None:
            return self.use_fused
        # round 5: the kernel covers every NIC cell/init/embedding variant
        # (GRU incl. zero-state, learned_init_state carries, frozen GloVe
        # tables) — the old per-family fallbacks are lifted with real
        # support (ops/fused_decode.py, parity-tested per family)
        return (
            self.mesh is None
            and jax.default_backend() == "tpu"
            and isinstance(self.model, NIC)
            and not getattr(self.model.encoder, "pregathered", False)
        )

    def _variables(self):
        """Variables for the decode call — placed replicated on the mesh
        once when sharded serving is on."""
        if self.mesh is None:
            return self.variables
        if self._placed_vars is None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self.mesh, P())
            self._placed_vars = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), self.variables
            )
        return self._placed_vars

    def _device_batch(self, chunk):
        import jax
        import jax.numpy as jnp

        if self.mesh is None:
            return jnp.asarray(chunk)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(chunk, NamedSharding(self.mesh, P("data")))

    @classmethod
    def from_components(cls, model, params, batch_stats, tokenizer, units,
                        max_length, **kw) -> "Captioner":
        return cls(
            model, {"params": params, "batch_stats": batch_stats}, tokenizer,
            units, max_length, **kw,
        )

    @classmethod
    def from_run_dir(cls, run_path: str, best: bool = True, **kw) -> "Captioner":
        """Rebuild model + weights from a training run directory
        (config.yaml + tokenizer.json + layout.npz + model/ checkpoints)."""
        import os

        import numpy as np

        from masters_thesis_tpu.config import Config
        from masters_thesis_tpu.data.tokenizer import Tokenizer
        from masters_thesis_tpu.experiment import build_model
        from masters_thesis_tpu.ops.group_layout import GroupLayout
        from masters_thesis_tpu.train.checkpoint import CheckpointManager
        from masters_thesis_tpu.train.optim import make_optimizer
        from masters_thesis_tpu.train.state import TrainState, init_model

        cfg = Config.load(os.path.join(run_path, "config.yaml"))
        from masters_thesis_tpu.experiment import apply_tpu_runtime_config

        # prng_impl must match the training run (key shapes differ) and the
        # persistent compile cache makes repeat serving starts hot
        apply_tpu_runtime_config(cfg)
        tokenizer = Tokenizer.load(os.path.join(run_path, "tokenizer.json"))
        layout_path = os.path.join(run_path, "layout.npz")
        if os.path.exists(layout_path):
            layout = GroupLayout.load(layout_path)
            groups = layout.to_groups()
            n_voxels = layout.n_voxels
            row_shape = (n_voxels,)
        else:
            # no layout (ShowTell family, image models, fc encoders): the
            # TRAINED row shape comes from run_meta.json — cfg.input_dim()
            # is a config constant the actual data can deviate from
            # (synthetic smoke width, image-model (patches, channels)), and
            # a wrong template shape fails the orbax restore
            import json as _json

            groups, row_shape = [], None
            meta_path = os.path.join(run_path, "run_meta.json")
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    recorded = _json.load(f).get("input_row_shape")
                if recorded:
                    row_shape = tuple(int(d) for d in recorded)
            if row_shape is None:  # pre-meta runs: the old guess
                row_shape = (cfg.input_dim(),)
            n_voxels = row_shape[0]
        # glove_NIC runs persist their resolved embedding table next to the
        # checkpoint (for glove_trainable=false it is a module constant the
        # checkpoint does NOT carry — the rebuild must use the real table)
        glove_path = os.path.join(run_path, "glove_table.npy")
        glove_table = np.load(glove_path) if os.path.exists(glove_path) else None
        model, _, _ = build_model(cfg, groups, n_voxels,
                                  embedding_table=glove_table)

        from masters_thesis_tpu.models.multisubject import DualSubjectEncoder

        enc_mod = getattr(model, "encoder", None)
        if isinstance(enc_mod, DualSubjectEncoder) and enc_mod.mode == "split":
            # the split layout is a TRAINING batch contract; a service
            # request's betas all come from one subject, so route every row
            # through that subject's encoder (kw: subject='a'|'b')
            import dataclasses

            model = dataclasses.replace(
                model, encoder=dataclasses.replace(
                    enc_mod, mode=kw.pop("subject", "a")))
        else:
            kw.pop("subject", None)

        # template state for orbax restore (trained row shape, not a guess)
        dummy_inputs = np.zeros((1, *row_shape), np.float32)
        dummy_tokens = np.zeros((1, cfg.max_length), np.int32)
        params, batch_stats, rng = init_model(
            model, cfg, dummy_inputs, dummy_tokens
        )
        state = TrainState.create(
            params=params, batch_stats=batch_stats, tx=make_optimizer(cfg),
            rng=rng,
        )
        mgr = CheckpointManager(os.path.join(run_path, "model"))
        state, epoch = mgr.restore(state, best=best)
        # the width guard checks the LAST input dim (image models serve
        # (N, patches, channels) requests; flat models (N, voxels))
        kw.setdefault("input_width", row_shape[-1])
        inst = cls.from_components(
            model, state.params, state.batch_stats, tokenizer, cfg.units,
            cfg.max_length, **kw,
        )
        inst.input_row_shape = tuple(row_shape)
        return inst

    def _decoder(self, kind: str):
        if kind not in self._decoders:
            if kind == "greedy" and self._fused_eligible():
                from masters_thesis_tpu.ops.fused_decode import (
                    make_whole_fused_greedy_decoder,
                )

                fused = make_whole_fused_greedy_decoder(
                    self.model, self.units, self.max_length,
                    batch_tile=min(64, self.batch_size),
                )

                def dec(variables, betas, start_id):
                    words, alphas = fused(variables, betas, start_id)
                    return words, None, alphas

                self._decoders[kind] = dec
            elif kind == "greedy":
                from masters_thesis_tpu.decode.greedy import make_greedy_decoder

                self._decoders[kind] = make_greedy_decoder(
                    self.model, self.units, self.max_length
                )
            elif kind == "beam":
                # the XLA fixed-lattice scan IS the fast beam path: a
                # whole-beam Pallas kernel was built and measured slower
                # (PERF.md "whole-beam search kernel")
                from masters_thesis_tpu.decode.beam import make_beam_decoder

                self._decoders[kind] = make_beam_decoder(
                    self.model, self.units, self.max_length,
                    beam_width=self.beam_width,
                )
            elif kind == "sample":
                from masters_thesis_tpu.decode.sampling import (
                    make_sampling_decoder,
                )

                self._decoders[kind] = make_sampling_decoder(
                    self.model, self.units, self.max_length,
                    temperature=self.temperature, top_k=self.sample_top_k,
                )
            else:
                raise ValueError(f"unknown decoder {kind!r}")
        return self._decoders[kind]

    def caption_ids(self, inputs: np.ndarray, decoder: str = "greedy"):
        """(N, D) inputs -> (N, T) token ids; pads to the service batch."""
        dec = self._decoder(decoder)
        variables = self._variables()

        def run_chunk(chunk):
            if decoder == "greedy":
                words, _, _ = dec(
                    variables, self._device_batch(chunk),
                    self.tokenizer.start_id,
                )
            elif decoder == "sample":
                import jax

                key = jax.random.fold_in(
                    jax.random.PRNGKey(self._seed), self._sample_calls
                )
                self._sample_calls += 1
                words = dec(
                    variables, self._device_batch(chunk),
                    self.tokenizer.start_id, key,
                )
            else:
                words, _, _, _, _ = dec(
                    variables, self._device_batch(chunk),
                    self.tokenizer.start_id, self.tokenizer.end_id,
                )
            # force per batch: serving from host memory is input-transfer
            # bound (84 MB betas/batch at flagship width), and measured on
            # the tunneled runtime a deferred-force pipeline is NOT faster
            # (in-flight transfers contend; PERF.md serving notes)
            return words

        return padded_chunk_ids(inputs, self.batch_size, self.max_length,
                                self.input_width, run_chunk)

    def caption(self, inputs: np.ndarray, decoder: str = "greedy") -> list[str]:
        ids = self.caption_ids(inputs, decoder)
        return [ids_to_caption(row, self.tokenizer) for row in ids]
