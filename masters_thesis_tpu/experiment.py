"""Experiment wiring: config -> data -> model -> trainer/eval.

The framework equivalent of the reference's entry scripts
(AttemptFour/main.py, main_ms.py, main_images.py, eval.py, metric_suit.py):
one config-driven path that selects the model family, builds the data
pipelines, trains with callbacks/checkpointing, and evaluates with greedy (or
beam) decoding + the metric suite.

When the configured dataset paths don't exist (no NSD data mounted), a
seeded synthetic dataset of the right shapes is used so every entry point is
runnable end-to-end ("smoke" mode — the reference has no equivalent; its
scripts hard-require the lab filesystem).
"""

from __future__ import annotations

import json
import logging
import os
import time

import numpy as np

from masters_thesis_tpu.config import Config
from masters_thesis_tpu.data.pairs import encode_pairs
from masters_thesis_tpu.data.pipeline import BatchPipeline, EvalPipeline
from masters_thesis_tpu.data.synthetic import synthetic_dataset
from masters_thesis_tpu.ops.group_layout import GroupLayout
from masters_thesis_tpu.train.losses import lc_nic_l2_rules
from masters_thesis_tpu.train.optim import make_optimizer
from masters_thesis_tpu.train.state import TrainState, init_model
from masters_thesis_tpu.train.steps import make_eval_step, make_train_step
from masters_thesis_tpu.utils.logging import MetricLogger, setup_run_dir

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------- data

def build_data(cfg: Config, smoke_keys: int = 48):
    """Returns (split, pairs, tokenizer, store, groups).

    Real-data mode activates when cfg.dataset.betas_path exists. Expected
    layout (produced by the offline preprocessing, see data/preprocess and
    data/pack):
      betas_path/           a pack dir (meta.json) OR subj0X_KID{key}.npy files
      captions_path/        KID{key}.txt (5 captions per key)
      nsd_dir/subj0X_conditions.csv + test_conditions.csv  (key split)
      nsd_dir/glasser_lh.npy + glasser_rh.npy              (atlas labels)
    """
    betas_path = cfg.dataset.betas_path
    if betas_path and os.path.isdir(betas_path):
        return _apply_group_selection(_build_real_data(cfg), cfg)
    n_voxels = min(cfg.input_dim(), 2048) if smoke_keys <= 64 else cfg.input_dim()
    if cfg.model.lower() == "guse_nic":
        n_voxels = 512  # GUSE sentence-embedding width (get_guse.py)
    # flagship-scale synthetic runs (smoke_keys > 64 at full voxel width)
    # get the real Glasser group count so the encoder matches the reference
    # model byte-for-byte in shape — the integrated-trainer throughput
    # contract (PERF.md) is only comparable to bench.py at 360 groups
    n_groups = (360 if n_voxels >= 65536
                else min(16, max(4, n_voxels // 128)))
    out = synthetic_dataset(
        n_keys=smoke_keys,
        n_voxels=n_voxels,
        n_groups=n_groups,
        top_k=min(cfg.top_k, 200),
        seed=cfg.seed,
        # "structured": betas encode the captions' latent factors so
        # held-out caption metrics can genuinely converge (the
        # caption_metrics_every evidence loop); "compositional" also holds
        # out the val/test keys' factor COMBINATIONS so the curve plateaus
        # below 1.0 and can rank models (round 5)
        structured=(cfg.dataset.synthetic
                    if cfg.dataset.synthetic in ("structured",
                                                 "compositional")
                    else False),
    )
    if cfg.model.lower() in ("img_nic", "cnn_rnn"):
        # image models consume (patches, channels) conv features, not flat
        # vectors (VGG16 (196, 512) / InceptionV3 (64, 2048))
        from masters_thesis_tpu.data.store import ArrayStore

        split, pairs, tok, store, groups = out
        rng = np.random.Generator(np.random.PCG64(cfg.seed))
        n_patches, channels = 16, max(32, min(cfg.embedding_features, 128))
        feats = rng.standard_normal(
            (len(store), n_patches, channels)
        ).astype(np.float32)
        store = ArrayStore(feats, store.keys.tolist())
        out = (split, pairs, tok, store, groups)
    return _apply_group_selection(out, cfg)


def _apply_group_selection(data, cfg: Config):
    """Drop cfg.groups_to_remove from the Glasser group list before the
    encoder is built — the flagship trains on 345 of 360 regions
    (AttemptFour/main.py:115). Indices beyond the group count (e.g. the
    345-region list against a 16-group smoke dataset) are ignored, matching
    select_groups' by-index filtering."""
    if not cfg.groups_to_remove:
        return data
    from masters_thesis_tpu.data.preprocess.glasser import select_groups

    split, pairs, tok, store, groups = data
    if groups is None:
        return data
    kept = select_groups(groups, list(cfg.groups_to_remove))
    n_removed = len(groups) - len(kept)
    logger.info(
        "group selection: %d -> %d groups (%d removed)",
        len(groups), len(kept), n_removed,
    )
    return split, pairs, tok, store, kept


# subject-B NSD keys are offset internally so two subjects' betas for the
# same stimulus can coexist in one store/pair list (NSD 73KIDs are < 10^6)
B_KEY_OFFSET = 10_000_000


def _load_beta_store(betas_path: str, keys):
    from masters_thesis_tpu.data.pack import open_pack
    from masters_thesis_tpu.data.store import ArrayStore

    import glob

    if os.path.exists(os.path.join(betas_path, "meta.json")):
        return open_pack(betas_path, device_resident=False)
    npys = glob.glob(os.path.join(betas_path, "*_KID*.npy"))
    assert npys, (
        f"betas path {betas_path!r} contains neither a packed dataset "
        "(meta.json) nor per-key *_KID*.npy beta files"
    )
    prefixes = sorted({os.path.basename(p).split("_KID")[0] for p in npys})
    if len(prefixes) > 1:
        # glob order is filesystem-dependent: silently picking one subject
        # from a dir holding several would train on arbitrary brain data
        raise ValueError(
            f"betas path {betas_path!r} holds files for multiple subject "
            f"prefixes {prefixes}; point betas_path (and betas_path_b) at "
            "one subject's files each")
    prefix = prefixes[0]
    return ArrayStore.from_npy_dir(
        betas_path, list(keys), lambda key: f"{prefix}_KID{key}.npy",
    )


def _build_real_data(cfg: Config):
    """NSD loading: key split, captions, beta store, Glasser groups.

    Two-subject mode (ms2_nic + dataset.betas_path_b, the main_ms.py setup):
    subject A loads from the first subj0*_conditions.csv + betas_path,
    subject B from the second CSV + betas_path_b; B's keys are offset by
    ``B_KEY_OFFSET`` in the combined pair list / store. Train and val pairs
    carry both subjects (the [A;B] batch layout comes from the pipeline's
    subject_split); the TEST split stays subject A's — the reference
    evaluates one subject at a time (swap the dataset paths to score B).
    """
    import glob

    from masters_thesis_tpu.data.captions import load_captions_dir
    from masters_thesis_tpu.data.pairs import create_pairs
    from masters_thesis_tpu.data.preprocess.glasser import groups_from_atlas
    from masters_thesis_tpu.data.splits import get_nsd_keys
    from masters_thesis_tpu.data.store import ArrayStore
    from masters_thesis_tpu.data.tokenizer import Tokenizer

    nsd_dir = cfg.dataset.nsd_dir
    cond_csvs = sorted(glob.glob(os.path.join(nsd_dir, "subj0*_conditions.csv")))
    assert cond_csvs, f"no subj0*_conditions.csv under {nsd_dir}"
    split = get_nsd_keys(
        cond_csvs[0], os.path.join(nsd_dir, "test_conditions.csv"),
        strict=False,  # the reference's 9000/1000/515 asserts only hold for
        #                full NSD subjects (load_avg_betas.py:221-223)
    )
    all_keys = np.concatenate([split.train, split.val, split.test])

    caps = load_captions_dir(cfg.dataset.captions_path, keys=all_keys)
    pairs = {
        name: create_pairs(getattr(split, name), caps, subject="A")
        for name in ("train", "val", "test")
    }

    # ms2_nic: two encoders, [A;B] split batches; ms_nic: ONE shared encoder
    # on the mixed pair list (main_ms_single_enc.py — equal-halves loss ==
    # batch mean, so plain shuffling is the correct layout there)
    two_subject = (cfg.model.lower() in ("ms2_nic", "ms_nic")
                   and bool(cfg.dataset.betas_path_b))
    store_b = None
    if two_subject:
        csv_b = cond_csvs[1] if len(cond_csvs) > 1 else cond_csvs[0]
        split_b = get_nsd_keys(
            csv_b, os.path.join(nsd_dir, "test_conditions.csv"), strict=False)
        keys_b = np.concatenate([split_b.train, split_b.val, split_b.test])
        caps_b_dir = cfg.dataset.captions_path_b or cfg.dataset.captions_path
        caps_b = load_captions_dir(caps_b_dir, keys=keys_b)
        for name in ("train", "val"):
            sub_pairs = create_pairs(getattr(split_b, name), caps_b,
                                     subject="B")
            pairs[name] = pairs[name] + [
                (int(k) + B_KEY_OFFSET, cap, cid, cnt, subj)
                for k, cap, cid, cnt, subj in sub_pairs
            ]
        store_b = _load_beta_store(cfg.dataset.betas_path_b, keys_b)
        logger.info(
            "two-subject data: %d + %d train pairs (B keys offset by %d)",
            sum(p[4] == "A" for p in pairs["train"]),
            sum(p[4] == "B" for p in pairs["train"]), B_KEY_OFFSET)

    tok_path = os.path.join(nsd_dir, "tokenizer.json")
    if os.path.exists(tok_path):
        tok = Tokenizer.load(tok_path)
    else:
        tok = Tokenizer(num_words=cfg.top_k)
        tok.fit_on_texts([p[1] for p in pairs["train"] + pairs["val"]])
        tok.install_pad()

    store = _load_beta_store(cfg.dataset.betas_path, all_keys)
    if store_b is not None:
        store = ArrayStore(
            np.concatenate([np.asarray(store.data),
                            np.asarray(store_b.data)]),
            [int(k) for k in store.keys]
            + [int(k) + B_KEY_OFFSET for k in store_b.keys],
        )

    lh = np.load(os.path.join(nsd_dir, "glasser_lh.npy"))
    rh = np.load(os.path.join(nsd_dir, "glasser_rh.npy"))
    groups = groups_from_atlas(lh, rh)
    return split, pairs, tok, store, groups


# ---------------------------------------------------------------- model

def _nic_dropouts(cfg: Config) -> dict:
    """The config's decoder dropout knobs, forwarded to every NIC family
    (a config recording dropout_* the model silently ignored would
    invalidate any dropout ablation)."""
    return {
        "dropout_input": cfg.dropout_input,
        "dropout_text": cfg.dropout_text,
        "dropout_attn": cfg.dropout_attn,
        "dropout_lstm": cfg.dropout_lstm,
        "dropout_out": cfg.dropout_out,
    }


def resolve_glove_table(cfg: Config, tokenizer):
    """cfg.glove_path -> (vocab_size, E) float32 table or None.

    The glove_NIC variant (AttemptFour/Model/glove_NIC.py) swaps the learned
    text embedding for pretrained GloVe vectors. A ``.npy`` path loads a
    prebuilt table; anything else parses as GloVe txt and is filtered to the
    run tokenizer's vocab (``build_glove_table``: zeros for OOV words,
    synthetic first/last-dim basis vectors for <start>/<end>)."""
    if not cfg.glove_path:
        return None
    if cfg.glove_path.endswith(".npy"):
        table = np.load(cfg.glove_path).astype(np.float32)
    else:
        from masters_thesis_tpu.data.captions import build_glove_table

        table = build_glove_table(
            cfg.glove_path, tokenizer, dim=cfg.embedding_text
        )
    if table.ndim != 2 or table.shape[0] != cfg.vocab_size:
        raise ValueError(
            f"glove table {cfg.glove_path!r} has shape {table.shape}; "
            f"expected ({cfg.vocab_size}, E) for top_k={cfg.top_k}"
        )
    return table


def build_model(cfg: Config, groups, n_voxels: int, pregathered: bool = False,
                embedding_table=None):
    """Select the model family from cfg.model; returns (model, l2_rules,
    masked). ``pregathered`` (LcNIC family only) builds the encoder for
    grouped-layout inputs (permuted HBM store fast path). ``embedding_table``
    (lc_nic/ms_nic only) is a resolved (vocab, E) GloVe table — the
    glove_NIC variant."""
    name = cfg.model.lower()
    # tpu.vocab_pad_multiple: build the vocab axis padded so TP meshes can
    # shard embedding/dense_out; true_vocab keeps numerics unpadded-exact
    # (models/common.py). tv=0 means "no padding" for every model class.
    V = cfg.padded_vocab_size
    tv = cfg.vocab_size if V != cfg.vocab_size else 0
    if embedding_table is not None and name not in ("lc_nic", "ms_nic"):
        raise ValueError(
            f"glove_path is only supported for lc_nic/ms_nic (the glove_NIC "
            f"variant), not model={cfg.model!r}"
        )
    if cfg.learned_init_state and name in (
        "ms2_nic", "guse_nic", "showtell", "thinkandtell"
    ):
        # showtell primes the LSTM from the feature vector by construction
        # and ms2/guse have no single feature bank to pool — refuse rather
        # than silently ignore the flag
        raise ValueError(
            f"learned_init_state is not supported for model={cfg.model!r}"
        )
    if name in ("lc_nic", "ms_nic"):
        from masters_thesis_tpu.models.nic import LcNIC

        glove = {}
        if embedding_table is not None:
            glove = dict(
                pretrained_embedding=embedding_table,
                embedding_trainable=cfg.glove_trainable,
            )
        layout = GroupLayout(groups, n_voxels)
        model = LcNIC(
            layout=layout,
            pregathered=pregathered,
            units=cfg.units,
            group_size=cfg.group_size,
            embedding_text=(int(embedding_table.shape[1])
                            if embedding_table is not None
                            else cfg.embedding_text),
            attn_units=cfg.attn_units,
            vocab_size=V, true_vocab=tv,
            max_length=cfg.max_length,
            dropout_input=cfg.dropout_input,
            dropout_features=cfg.dropout_features,
            dropout_text=cfg.dropout_text,
            dropout_attn=cfg.dropout_attn,
            dropout_lstm=cfg.dropout_lstm,
            dropout_out=cfg.dropout_out,
            remat=cfg.tpu.remat,
            learned_init_state=cfg.learned_init_state,
            **glove,
        )
        return model, lc_nic_l2_rules(cfg), False
    if name in ("concat_lc_nic", "deep_lc_nic", "fc_nic"):
        # the alternate brain encoders the reference swaps into lc_NIC by
        # editing dense_in (lc_NIC.py:60-91): the concat LocallyDense
        # (localDense.py), the deep per-region stack (deep_layers.py), and
        # the single fullyConnected encoder (fullyConnected.py)
        from masters_thesis_tpu.models.encoders import (
            ConcatLocallyDense,
            DeepLocallyDense,
            FullyConnectedEncoder,
        )
        from masters_thesis_tpu.models.nic import NIC

        layout = GroupLayout(groups, n_voxels)
        if name == "concat_lc_nic":
            encoder = ConcatLocallyDense(
                layout=layout, out_dim=cfg.group_size,
                embed_dim=cfg.embedding_features,
                dropout=cfg.dropout_features, name="encoder",
            )
        elif name == "deep_lc_nic":
            encoder = DeepLocallyDense(
                layout=layout, out_dim=cfg.group_size,
                dropout=cfg.dropout_features, name="encoder",
            )
        else:
            encoder = FullyConnectedEncoder(
                out_dim=cfg.embedding_features,
                dropout=cfg.dropout_features, name="encoder",
            )
        model = NIC(
            encoder=encoder,
            units=cfg.units,
            embedding_text=cfg.embedding_text,
            attn_units=cfg.attn_units,
            vocab_size=V, true_vocab=tv,
            max_length=cfg.max_length,
            dropout_input=cfg.dropout_input,
            dropout_text=cfg.dropout_text,
            dropout_attn=cfg.dropout_attn,
            dropout_lstm=cfg.dropout_lstm,
            dropout_out=cfg.dropout_out,
            remat=cfg.tpu.remat,
            learned_init_state=cfg.learned_init_state,
        )
        return model, lc_nic_l2_rules(cfg), False
    if name == "ms2_nic":
        from masters_thesis_tpu.models.multisubject import Ms2NIC

        layout = GroupLayout(groups, n_voxels)
        model = Ms2NIC(
            layout, layout,
            units=cfg.units, group_size=cfg.group_size,
            embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
            vocab_size=V, true_vocab=tv, max_length=cfg.max_length,
            dropout_features=cfg.dropout_features, **_nic_dropouts(cfg),
        )
        return model, lc_nic_l2_rules(cfg), False
    if name == "img_nic":
        from masters_thesis_tpu.models.nic import ImgNIC

        model = ImgNIC(
            # reference: patches project to group_size, not
            # embedding_features (img_NIC.py:60-62, config_img.yaml:59)
            embed_dim=cfg.group_size, units=cfg.units,
            attn_units=cfg.attn_units, vocab_size=V, true_vocab=tv,
            max_length=cfg.max_length, embedding_text=cfg.embedding_text,
            dropout_features=cfg.dropout_features, remat=cfg.tpu.remat,
            learned_init_state=cfg.learned_init_state,
            **_nic_dropouts(cfg),
        )
        return model, lc_nic_l2_rules(cfg), False
    if name == "cnn_rnn":
        from masters_thesis_tpu.models.nic import CnnRnnNIC

        model = CnnRnnNIC(
            embed_dim=256, units=cfg.units, vocab_size=V, true_vocab=tv,
            max_length=cfg.max_length, remat=cfg.tpu.remat,
            learned_init_state=cfg.learned_init_state,
            **_nic_dropouts(cfg),
        )
        return model, lc_nic_l2_rules(cfg), True
    if name in ("showtell", "thinkandtell"):
        from masters_thesis_tpu.models.showtell import ShowTell, showtell_l2_rules

        model = ShowTell(
            units=cfg.units,
            embed_dim=cfg.embedding_features,
            embedding_text=cfg.embedding_features,
            vocab_size=V, true_vocab=tv,
            max_length=cfg.max_length,
            head_activation="relu" if name == "thinkandtell" else "linear",
            # ThinkAndTell supervises slots 0..T-1 incl. the feat-slot->
            # <start> term against UNSHIFTED targets (model.py:271);
            # ShowAndTell skips i=0 — shifted-target alignment
            # (model.py:154). Round-4 head-to-head fix.
            align="self" if name == "thinkandtell" else "next",
            # ShowAndTell primes with relu(fc(x)) (model.py:19),
            # ThinkAndTell with tanh (model.py:21-28)
            encoder_activation=("tanh" if name == "thinkandtell"
                                else "relu"),
            # ShowAndTell's linear fc1 head stage (model.py:37,60-63)
            head_inter=(name == "showtell"),
            dropout=cfg.dropout_features,
        )
        return model, showtell_l2_rules(cfg), True
    if name == "guse_nic":
        from masters_thesis_tpu.models.showtell import GuseNIC, showtell_l2_rules

        model = GuseNIC(
            units=cfg.units, vocab_size=V, true_vocab=tv,
            max_length=cfg.max_length, dropout=cfg.dropout_features,
        )
        return model, showtell_l2_rules(cfg), True
    raise ValueError(f"unknown model {cfg.model!r}")


def _step_profiling(run_path: str, cfg: Config):
    from masters_thesis_tpu.train.callbacks import StepProfiling

    return StepProfiling(run_path, cfg.tpu.profile_steps)


def _trace_capture(run_path: str):
    from masters_thesis_tpu.train.callbacks import TraceCapture

    return TraceCapture(run_path)


def _greedy_decoder(model, cfg):
    from masters_thesis_tpu.decode.greedy import make_greedy_decoder

    return make_greedy_decoder(model, cfg.units, cfg.max_length)


# ---------------------------------------------------------------- train

def apply_tpu_runtime_config(cfg: Config) -> None:
    """Process-level JAX knobs from the config's tpu section.

    - ``tpu.prng_impl``: must run before any PRNG keys are created (the
      state's rng / dropout masks; key SHAPES differ between impls).
    - ``tpu.compile_cache_dir``: persistent XLA compile cache — first
      flagship compiles take minutes on remote/tunneled TPU runtimes, so
      train/eval/serve all start hot after the first run. "" disables.
      TPU-only: XLA:CPU caches AOT machine code keyed loosely enough that
      entries compiled under different flags/feature tuning load with
      feature-mismatch (potential SIGILL) warnings — and CPU compiles are
      cheap anyway.
    Idempotent; safe to call from every entry point.
    """
    import jax as _jax

    if cfg.tpu.prng_impl != "default":
        _jax.config.update("jax_default_prng_impl", cfg.tpu.prng_impl)
    if cfg.tpu.compile_cache_dir and _jax.default_backend() == "tpu":
        cache = os.path.expanduser(cfg.tpu.compile_cache_dir)
        try:
            os.makedirs(cache, exist_ok=True)
        except OSError:
            return  # read-only home etc. — run uncached rather than fail
        _jax.config.update("jax_compilation_cache_dir", cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def run_training(cfg: Config, epochs: int | None = None, smoke_keys: int = 48,
                 resume: bool = False, extra_callbacks=()):
    """Full training run; returns (run_path, final logs, state bundle).

    ``resume=True`` restores the latest checkpoint in the run dir and
    continues from the next epoch (the reference's CheckpointManager resume,
    CNN_RNN/train.py:272-287). ``extra_callbacks`` are appended to the
    standard callback list (the tune runner injects its per-epoch reporter
    here, like Ray's TuneReportCallback, tune.py:146-153).

    Distributed training (new TPU surface; the reference is single-GPU,
    main.py:269-281): ``tpu.mesh_data``/``tpu.mesh_model`` != 1 builds a
    ('data','model') mesh, shards the TrainState (parallel/sharding.py
    rules), swaps in the mesh-jitted train/eval/scanned steps, and places
    every batch via MeshInputPlacer. Multi-process runs (launched with
    JAX_COORDINATOR_ADDRESS et al., see parallel.mesh.maybe_distributed_init)
    run this SAME function in every process: the seed-deterministic pipeline
    rebuilds identical global batches everywhere, each host feeds only its
    slice, and checkpoints save/restore the sharded state collectively.
    Preview/caption-metric/grad-stat callbacks are single-process features
    (they drive extra jitted programs outside the symmetric train loop) and
    are disabled when process_count > 1; loss metrics, checkpointing and
    resume are full product surface in both modes. ``mesh_data: 0`` means
    "all remaining devices" (mesh.py:make_mesh)."""
    apply_tpu_runtime_config(cfg)
    use_mesh = cfg.tpu.mesh_data != 1 or cfg.tpu.mesh_model != 1
    mesh = None
    if use_mesh:
        from masters_thesis_tpu.parallel.mesh import (
            make_mesh,
            maybe_distributed_init,
        )

        maybe_distributed_init()
        mesh = make_mesh(data=cfg.tpu.mesh_data, model=cfg.tpu.mesh_model)
    import jax

    n_proc = jax.process_count()
    is_primary = jax.process_index() == 0
    run_path = setup_run_dir(cfg.log, cfg.run, cfg if is_primary else None,
                             file_log=is_primary)
    split, pairs, tok, store, groups = build_data(cfg, smoke_keys)
    if is_primary:
        tok.save(os.path.join(run_path, "tokenizer.json"))
    # glove_NIC variant: resolve the pretrained table once and persist it in
    # the run dir — serving/eval rebuilds need the exact table (for
    # glove_trainable=false it is a module constant, not in the checkpoint).
    # On resume the PERSISTED table is authoritative: re-parsing
    # cfg.glove_path could yield a different table than the weights were
    # trained against (source file updated/moved) and would silently
    # overwrite the provenance copy.
    glove_table = None
    if cfg.glove_path:
        persisted = os.path.join(run_path, "glove_table.npy")
        if resume and os.path.exists(persisted):
            glove_table = np.load(persisted)
        else:
            glove_table = resolve_glove_table(cfg, tok)
            if is_primary:
                np.save(persisted, glove_table)

    n_voxels = store.row_shape[0]
    # the TRAINED input row shape, before the store is repacked/permuted —
    # recorded in run_meta.json so serving/export rebuilds restore against
    # the real trained shapes instead of guessing from cfg.input_dim()
    # (synthetic smoke runs and image-model patch inputs both deviate)
    input_row_shape = [int(d) for d in store.row_shape]
    # pregathered fast path: when the whole run trains from an HBM store on
    # TPU with a LocallyDense encoder, permute the store into the grouped
    # padded layout ONCE at upload — the encoder then skips its own
    # 84 MB/step voxel->group gather (the layout is the encoder's static
    # bucket order; params/checkpoints are identical either way)
    pregathered = (
        cfg.tpu.scan_steps > 0
        and not store.device_resident
        and jax.default_backend() == "tpu"
        and cfg.model.lower() in ("lc_nic", "ms_nic")
        # the pregathered layout is lane-packed for the Pallas DMA gather,
        # which is not GSPMD-partitionable — mesh stores stay 2D
        and mesh is None
    )
    model, l2_rules, masked = build_model(cfg, groups, n_voxels,
                                          pregathered=pregathered,
                                          embedding_table=glove_table)
    # persist the group layout so the model can be rebuilt for serving
    if is_primary and cfg.model.lower() in ("lc_nic", "ms_nic", "ms2_nic"):
        GroupLayout(groups, n_voxels).save(os.path.join(run_path, "layout.npz"))

    store_width = n_voxels
    mesh_host_store = None  # host copy for mesh-mode per-step/init gathers
    if cfg.tpu.scan_steps > 0 and not store.device_resident:
        # multi-step training gathers betas on device: move the store into
        # HBM once (optionally bf16). On TPU the store is packed into the
        # (N, S, 128) row-block layout so the in-step gather runs through
        # the Pallas DMA kernel (ops/gather.py, measured 5.8x jnp.take)
        from masters_thesis_tpu.data.store import ArrayStore

        data = np.asarray(store.data)
        if pregathered:
            data = GroupLayout(groups, n_voxels).permute_rows(data)
            # no width slice: the pregathered encoder ignores the packed
            # store's lane-padding tail (per-bucket segment slices)
            store_width = None
        if mesh is not None:
            mesh_host_store = data
            store = ArrayStore(
                data, store.keys.tolist(), device_resident=True,
                dtype=cfg.tpu.store_dtype, mesh=mesh,
            )
        else:
            store = ArrayStore(
                data, store.keys.tolist(),
                device_resident=True, dtype=cfg.tpu.store_dtype,
                pack_lanes=(jax.default_backend() == "tpu"
                            and cfg.tpu.use_pallas),
            )

    train_enc = encode_pairs(pairs["train"], tok, cfg.max_length)
    val_enc = encode_pairs(pairs["val"], tok, cfg.max_length)
    bs = min(cfg.batch_size, max(2, len(train_enc) // 2))
    if mesh is not None:
        # the global batch shards its rows over the 'data' axis — and
        # ms2_nic's [A-half ; B-half] layout also needs an even batch, so
        # solve both constraints JOINTLY (rounding to the data axis first
        # and parity second could produce a batch divisible by neither)
        import math

        d = mesh.shape["data"]
        mult = math.lcm(d, 2) if cfg.model.lower() == "ms2_nic" else d
        new_bs = max(mult, (bs // mult) * mult)
        if new_bs != bs:
            logger.warning(
                "batch size %d not divisible by data axis %d%s; using %d",
                bs, d, " x subject-split 2" if mult != d else "", new_bs)
            bs = new_bs
    # ms2_NIC's two-encoder split requires every batch laid out
    # [A-half ; B-half] (main_ms.py's generator contract) — a plain
    # shuffled pipeline would train each per-subject encoder on
    # mixed-subject rows with no error
    subject_split = cfg.model.lower() == "ms2_nic"
    if subject_split:
        for enc in (train_enc, val_enc):
            if len(np.unique(enc.subjects)) < 2:
                # single-subject pair list (synthetic smoke data, or a
                # one-subject dataset): alternate pseudo-subject ids so the
                # batch layout contract holds; both encoders then see the
                # same distribution — the reference's ablation structure,
                # not real two-subject training
                logger.warning(
                    "ms2_nic with a single-subject pair list: assigning "
                    "alternating pseudo-subject ids (real two-subject runs "
                    "need per-subject pair lists / subject_ids)")
                enc.subjects = np.arange(len(enc), dtype=np.int32) % 2
    if subject_split and bs % 2:
        bs -= 1  # the [A-half ; B-half] layout needs an even batch
    self_target = cfg.model.lower() == "thinkandtell"  # ShowTell align="self"
    train_pipe = BatchPipeline(train_enc, store, bs, seed=cfg.seed,
                               subject_split=subject_split,
                               self_target=self_target)
    val_pipe = BatchPipeline(val_enc, store, bs, seed=cfg.seed, shuffle=False,
                             subject_split=subject_split,
                             self_target=self_target)

    # same target alignment / subject layout as training: this batch also
    # feeds GradStats, whose per-epoch gradient norms must be taken on the
    # training objective (ThinkAndTell supervises UNSHIFTED targets)
    batch = next(iter(BatchPipeline(train_enc, store, bs, seed=0, prefetch=0,
                                    subject_split=subject_split,
                                    self_target=self_target).epoch()))
    if "betas" in batch:
        betas0 = np.asarray(batch["betas"])
    elif mesh_host_store is not None:
        # an eager gather on a process-spanning store would not run
        # multi-process; init gathers from the host copy instead
        betas0 = np.asarray(mesh_host_store[batch["idx"]], np.float32)
    else:
        betas0 = np.asarray(store.device_gather(batch["idx"]), np.float32)
    params, batch_stats, rng = init_model(model, cfg, betas0, batch["tokens"])
    if cfg.warm_start:
        from masters_thesis_tpu.train.checkpoint import warm_start_from_run

        params, ws_report = warm_start_from_run(params, cfg.warm_start)
        logger.info(
            "warm start from %s (epoch %s): %d loaded, %d shape-skipped, "
            "%d missing", cfg.warm_start, ws_report.get("source_epoch"),
            len(ws_report["loaded"]), len(ws_report["skipped_shape"]),
            len(ws_report["missing"]),
        )
    tx = make_optimizer(cfg)
    state = TrainState.create(params=params, batch_stats=batch_stats, tx=tx, rng=rng)

    placer = None
    if mesh is not None:
        from masters_thesis_tpu.parallel.sharding import (
            MeshInputPlacer,
            shard_params,
        )

        # identical seeded init in every process (single-controller SPMD
        # style), then placed onto the mesh per the sharding rules
        state = shard_params(state, mesh)
        placer = MeshInputPlacer(mesh, with_voxel_axis=True)
        placer.host_store = mesh_host_store

    from masters_thesis_tpu.utils.summary import model_summary

    if is_primary:
        with open(os.path.join(run_path, "modelsummary.txt"), "w") as f:
            f.write(model_summary(params, batch_stats, name=cfg.model))

    # provenance snapshot (the reference copies the model source into the
    # run dir, main.py:58; here: package version + git revision + device)
    import subprocess

    import jax

    try:
        rev = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            timeout=5,
        ).stdout.strip() or None
    except Exception:
        rev = None
    from masters_thesis_tpu.version import __version__

    if is_primary:
        with open(os.path.join(run_path, "run_meta.json"), "w") as f:
            json.dump({
                "framework_version": __version__,
                "git_revision": rev,
                "model": cfg.model,
                "backend": jax.default_backend(),
                "n_devices": jax.device_count(),
                "n_processes": n_proc,
                "mesh": (dict(zip(mesh.axis_names,
                                  (int(s) for s in mesh.devices.shape)))
                         if mesh is not None else None),
                "input_row_shape": input_row_shape,
            }, f, indent=1)

    from masters_thesis_tpu.train.callbacks import (
        BatchLoss,
        CaptionImagePreview,
        Checkpointing,
        ErrorLog,
        GradStats,
        LossHistory,
        PredictPreview,
        TensorBoardScalars,
        load_stimulus_images,
    )
    from masters_thesis_tpu.train.steps import make_grad_stats_fn
    from masters_thesis_tpu.train.checkpoint import CheckpointManager
    from masters_thesis_tpu.train.loop import Trainer

    # decoded caption metrics on the val split during training (round 4):
    # one row per unique val key, references rebuilt from the raw pairs
    caption_metrics_cb = None
    if cfg.caption_metrics_every > 0 and pairs["val"] and n_proc == 1:
        from masters_thesis_tpu.train.callbacks import CaptionMetrics

        seen: set = set()
        unique_val = []
        refs_by_key: dict = {}
        for key, cap, cid, count, subj in pairs["val"]:
            refs_by_key.setdefault(int(key), []).append(
                " ".join(cap.split()[1:-1]))  # strip <start>/<end>
            if int(key) not in seen:
                seen.add(int(key))
                unique_val.append((key, cap, cid, count, subj))
        cm_enc = encode_pairs(unique_val, tok, cfg.max_length)
        cm_pipe = EvalPipeline(cm_enc, store, min(bs, len(cm_enc)))
        caption_metrics_cb = CaptionMetrics(
            _greedy_decoder(model, cfg), cm_pipe, tok, refs_by_key,
            every=cfg.caption_metrics_every)

    mgr = CheckpointManager(os.path.join(run_path, "model"))
    start_epoch = 0
    if resume:
        state, restored_epoch = mgr.restore(state)
        if restored_epoch is not None:
            start_epoch = restored_epoch + 1
            logger.info("resumed from epoch %d", restored_epoch)

    if mesh is not None:
        from masters_thesis_tpu.parallel.sharding import (
            make_sharded_eval_step,
            make_sharded_train_step,
        )

        train_step = make_sharded_train_step(
            model, cfg, l2_rules, mesh, state, masked=masked)
        eval_step = make_sharded_eval_step(
            model, cfg, l2_rules, mesh, state, masked=masked)
    else:
        train_step = make_train_step(model, cfg, l2_rules, masked=masked,
                                     donate=False)
        eval_step = make_eval_step(model, cfg, l2_rules, masked=masked)

    # multi-process runs keep only the symmetric callbacks: checkpointing is
    # COLLECTIVE (orbax saves the sharded state from every host), file
    # writers run on process 0, and the preview/caption/grad-stat callbacks
    # — which drive their own jitted programs outside the train loop — are
    # single-process features (see run_training docstring)
    if n_proc > 1:
        callbacks = [
            *([ErrorLog(run_path), LossHistory(run_path),
               BatchLoss(run_path)] if is_primary else []),
            Checkpointing(mgr, every=getattr(cfg.tpu, "ckpt_every", 1)),
            *([TensorBoardScalars(os.path.join(run_path, "tb"))]
              if is_primary else []),
            *extra_callbacks,
        ]
    else:
        # one preview batch + one decoder, shared by both preview callbacks
        # (building them twice gathered/encoded the same shuffle=False first
        # batch twice and spawned an abandoned prefetch producer each)
        preview_batch = (next(iter(val_pipe.epoch()))
                         if len(val_enc) >= bs
                         else next(iter(train_pipe.epoch())))
        preview_decoder = _greedy_decoder(model, cfg)
        callbacks = [
            ErrorLog(run_path),
            LossHistory(run_path),
            BatchLoss(run_path),
            Checkpointing(mgr, every=getattr(cfg.tpu, "ckpt_every", 1)),
            # before TensorBoardScalars: CaptionMetrics mutates logs with
            # val_bleu*/val_cider, which only reach the epoch/ TB scalars
            # (and any monitor-style callback) if it runs first
            *([caption_metrics_cb] if caption_metrics_cb else []),
            TensorBoardScalars(os.path.join(run_path, "tb")),
            PredictPreview(
                run_path,
                preview_decoder,
                preview_batch,
                tok,
                every=5,
            ),
            CaptionImagePreview(
                os.path.join(run_path, "tb"),
                preview_decoder,
                preview_batch,
                tok,
                # caption drawn over the stimulus picture when the run has
                # one on disk (soloist TensorBoardCaption semantics)
                images=load_stimulus_images(
                    cfg.dataset.images_path, preview_batch.get("keys", [])),
                every=5,
            ),
            GradStats(
                run_path,
                make_grad_stats_fn(model, cfg, l2_rules, masked=masked),
                batch,
                every=5,
            ),
            *([_step_profiling(run_path, cfg)]
              if cfg.tpu.profile_steps > 0 else []),
            *([_trace_capture(run_path)]
              if cfg.tpu.profile_trace else []),
            *extra_callbacks,
        ]
    trainer = Trainer(
        cfg,
        train_step,
        eval_step,
        state,
        train_pipe,
        val_pipe,
        callbacks=callbacks,
        store=store,
        metric_logger=(MetricLogger(os.path.join(run_path, "metrics.jsonl"))
                       if is_primary else None),
        input_placer=placer,
    )
    if cfg.tpu.scan_steps > 0 and mesh is not None:
        from masters_thesis_tpu.parallel.sharding import (
            make_sharded_scanned_eval_steps_from_tables,
            make_sharded_scanned_train_steps_from_tables,
        )

        store_ndim = len(store.row_shape) + 1
        trainer.use_scanned_steps(
            make_sharded_scanned_train_steps_from_tables(
                model, cfg, l2_rules, mesh, state, masked=masked,
                store_width=store_width, store_ndim=store_ndim),
            tables=True,
        )
        trainer.use_scanned_eval(
            make_sharded_scanned_eval_steps_from_tables(
                model, cfg, l2_rules, mesh, state, masked=masked,
                store_width=store_width, store_ndim=store_ndim)
        )
    elif cfg.tpu.scan_steps > 0:
        from masters_thesis_tpu.train.steps import (
            make_scanned_eval_steps_from_tables,
            make_scanned_train_steps_from_tables,
        )

        # tables variant: tokens/targets/store-ids upload once; each device
        # call ships only the (K, B) pair permutation (~KB/epoch instead of
        # ~MB of stacked tokens — the measured integrated-trainer gap vs
        # bench on tunneled runtimes)
        trainer.use_scanned_steps(
            make_scanned_train_steps_from_tables(
                model, cfg, l2_rules, masked=masked,
                store_width=store_width, store_packed=store.packed),
            tables=True,
        )
        trainer.use_scanned_eval(
            make_scanned_eval_steps_from_tables(
                model, cfg, l2_rules, masked=masked,
                store_width=store_width, store_packed=store.packed)
        )
    t_fit = time.perf_counter()
    logs = trainer.fit(epochs=epochs, start_epoch=start_epoch)
    # append the measured throughput to run_meta.json so every run carries
    # its own perf record (the integrated-trainer contract, PERF.md): final
    # epoch's train-phase steps/s + total fit wall time
    if not is_primary:
        return run_path, logs, {
            "model": model, "state": trainer.state, "tokenizer": tok,
            "store": store, "split": split, "pairs": pairs, "cfg": cfg,
            "manager": mgr,
        }
    try:
        meta_path = os.path.join(run_path, "run_meta.json")
        with open(meta_path) as f:
            meta = json.load(f)
        meta["train_wall_s"] = round(
            time.perf_counter() - t_fit, 2)
        meta["steps_per_sec_final_epoch"] = round(
            float(logs.get("steps_per_sec", 0.0)), 2)
        sps = trainer.epoch_steps_per_sec
        if len(sps) > 1:
            # epoch 0 carries the compile; median over the rest is the
            # steady-state number (single epochs jitter under link noise)
            meta["steps_per_sec_median"] = round(
                float(np.median(sps[1:])), 2)
        # epochs actually EXECUTED this fit (resume starts mid-way and
        # early stopping ends short; the configured target is separate)
        meta["epochs_ran"] = len(sps)
        meta["epochs_target"] = epochs if epochs is not None else cfg.epochs
        if caption_metrics_cb is not None and caption_metrics_cb.history:
            # the convergence curve: decoded val BLEU/CIDEr over training
            meta["caption_metrics"] = caption_metrics_cb.history
        with open(meta_path, "w") as f:
            json.dump(meta, f, indent=1)
    except Exception:  # pragma: no cover — perf record must never kill a run
        logger.warning("could not append throughput to run_meta.json",
                       exc_info=True)
    bundle = {
        "model": model, "state": trainer.state, "tokenizer": tok,
        "store": store, "split": split, "pairs": pairs, "cfg": cfg,
        "manager": mgr,
    }
    return run_path, logs, bundle


# ---------------------------------------------------------------- preprocess

def apply_preprocess_chain(pre_dir: str, rows: np.ndarray) -> np.ndarray:
    """Replay a preprocess run's derived-view chain (transform.json:
    vc_mask -> normalize -> pca, whichever stages ran) on arbitrary (N, V)
    rows — serving requests and new sessions must go through the SAME
    transforms the training pack did (`mtt transform`)."""
    from masters_thesis_tpu.data.preprocess.pca import PCAModel

    with open(os.path.join(pre_dir, "transform.json")) as f:
        meta = json.load(f)
    x = np.asarray(rows, np.float32)
    raw_shape = meta.get("input_row_shape")
    if raw_shape and list(x.shape[1:]) != list(raw_shape):
        # a vc-mask gather would silently accept any rows wide enough for
        # its max index — wrong vertices, garbage captions, no error
        raise ValueError(
            f"chain {pre_dir!r} was recorded on rows of shape {raw_shape}; "
            f"got {list(x.shape[1:])}")
    for st in meta["stages"]:
        path = os.path.join(pre_dir, st["file"])
        if st["stage"] == "vc_mask":
            x = x[:, np.load(path)]
        elif st["stage"] == "normalize":
            d = np.load(path)
            x = (x - d["mean"]) / d["std"]
        elif st["stage"] == "pca":
            x = PCAModel.load(path).transform(x).astype(np.float32)
        else:
            raise ValueError(f"unknown transform stage {st['stage']!r}")
    expect = meta.get("final_row_shape")
    if expect and list(x.shape[1:]) != list(expect):
        raise ValueError(
            f"replayed chain produced rows of shape {x.shape[1:]}, "
            f"expected {expect}")
    return x


def _train_split_indices(view, nsd_dir):
    """Pack-row indices of the unique-train keys, or (None, 'all_rows').

    Picks the conditions CSV whose train split covers the most pack keys —
    an nsd_dir can hold several subjects' CSVs, and blindly taking the
    alphabetically first would fit statistics on the WRONG subject's split
    (near-zero key overlap, a degenerate fit with no error)."""
    if not (nsd_dir and os.path.isdir(nsd_dir)):
        return None, "all_rows"
    import glob as _glob

    from masters_thesis_tpu.data.splits import get_nsd_keys

    test_csv = os.path.join(nsd_dir, "test_conditions.csv")
    conds = sorted(_glob.glob(os.path.join(nsd_dir, "subj0*_conditions.csv")))
    if not conds or not os.path.exists(test_csv):
        return None, "all_rows"
    key_to_row = {int(k): i for i, k in enumerate(view.keys.tolist())}
    best_idx, best_cond = [], None
    for cond in conds:
        split = get_nsd_keys(cond, test_csv, strict=False)
        idx = [key_to_row[k] for k in split.train.tolist() if k in key_to_row]
        if len(idx) > len(best_idx):
            best_idx, best_cond = idx, cond
    if not best_idx:
        return None, "all_rows"
    if len(conds) > 1:
        logger.info(
            "preprocess: train split from %s (best pack-key coverage: %d)",
            os.path.basename(best_cond), len(best_idx))
    return np.asarray(best_idx), f"train_split:{len(best_idx)}"


def _parse_visual_parcels(spec: str) -> list[int]:
    """``--vc-parcels``: a comma-separated label list, or a CSV file like
    the reference's VISUAL_MASK table (ThinkAndTell/train.py:91-92 reads it
    with pandas index_col=0 and flattens the values).

    File parsing is structural, not guess-per-row: a first line with any
    non-numeric NON-EMPTY field is the header (trailing commas alone never
    make one — a '1,2,3,' value list keeps its first row). With a header,
    the first COLUMN is dropped when it is pandas' index — either unnamed
    (empty first header field, the reference's ',0' layout) or a named
    serial index (the data rows' first fields count 0..N-1 or 1..N), so a
    'idx,parcel' export can't leak row numbers (incl. parcel 0, the
    unlabelled region) into the mask. A fully-numeric file is a plain
    value list — every field counts."""
    if not os.path.exists(spec):
        return [int(p) for p in spec.split(",") if p.strip()]
    with open(spec) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    if not lines:
        raise ValueError(f"no parcel labels parsed from {spec!r}")

    def fields(line):
        # trailing empty fields are CSV artifacts (trailing commas), not
        # structure — strip them before any header/index decision
        out = [p.strip() for p in line.split(",")]
        while out and out[-1] == "":
            out.pop()
        return out

    def numeric(vals):
        try:
            return [int(float(p)) for p in vals]
        except ValueError:
            return None

    first = fields(lines[0])
    drop_index = False
    if numeric([p for p in first if p]) is None or (first and first[0] == ""):
        # header row (pandas writes an unnamed index as an empty first name)
        data = [fields(ln) for ln in lines[1:]]
        if first and first[0] == "":
            drop_index = True
        else:
            # named index column: detect a serial 0..N-1 / 1..N first column
            col0 = numeric([row[0] for row in data if row])
            n = len(data)
            drop_index = (
                len(first) > 1 and col0 is not None
                and (col0 == list(range(n)) or col0 == list(range(1, n + 1)))
            )
        lines = lines[1:]
    parcels: list[int] = []
    for line in lines:
        vals = fields(line)
        if drop_index:
            vals = vals[1:]
        nums = numeric([p for p in vals if p])
        if nums is None:
            raise ValueError(
                f"non-numeric parcel field in {spec!r}: {line!r}")
        parcels.extend(nums)
    if not parcels:
        raise ValueError(f"no parcel labels parsed from {spec!r}")
    return parcels


def run_preprocess(
    cfg: Config,
    out_dir: str,
    pca_components: int = 0,
    from_sessions: str | None = None,
    behavior: str | None = None,
    captions_json: str | None = None,
    n_sessions: int = 40,
    vc_parcels: str | None = None,
    normalize: bool = False,
) -> dict:
    """Offline preprocessing driver (the reference's ian_code/nsd_get_data +
    data_mean + SVD/svd.py stage): [optionally session files -> per-trial
    npy (my_get_betas, nsd_get_data.py:174-281), then] per-key npy betas ->
    pack (repeats averaged, nsd_get_data.py:527); per-voxel mean/std;
    optional PCA model; tokenizer from the captions dir."""
    from masters_thesis_tpu.data.captions import load_captions_dir
    from masters_thesis_tpu.data.pack import open_pack, write_pack
    from masters_thesis_tpu.data.pairs import clean_caption
    from masters_thesis_tpu.data.preprocess.pca import fit_pca
    from masters_thesis_tpu.data.preprocess.sessions import (
        averaged_rows,
        ingest_sessions,
    )
    from masters_thesis_tpu.data.preprocess.zscore import voxelwise_stats
    from masters_thesis_tpu.data.tokenizer import Tokenizer

    os.makedirs(out_dir, exist_ok=True)
    report: dict = {}

    betas_path = cfg.dataset.betas_path
    captions_path = cfg.dataset.captions_path
    if from_sessions:
        assert behavior, "--from-sessions needs --behavior (CSV/TSV or dir)"
        ingest = ingest_sessions(
            from_sessions, behavior, os.path.join(out_dir, "ingest"),
            n_sessions=n_sessions, captions_json=captions_json,
        )
        report["ingest"] = {k: v for k, v in ingest.items() if k != "subjects"}
        subjects = ingest["subjects"]
        assert len(subjects) == 1, (
            f"session ingest found subjects {sorted(subjects)}; run one "
            "subject's sessions per preprocess invocation (reference loops "
            "my_get_betas per subject)"
        )
        (_, paths), = subjects.items()
        betas_path = paths["betas"]
        if captions_json:
            captions_path = paths["captions"]

    pack_dir = os.path.join(out_dir, "betas_pack")
    meta = write_pack(pack_dir, None, averaged_rows(betas_path))
    report["pack"] = meta

    store = open_pack(pack_dir)
    # keep the memmap: voxelwise_stats streams chunked passes over it
    mean, std = voxelwise_stats(store.data)
    np.savez(os.path.join(out_dir, "voxel_stats.npz"), mean=mean, std=std)
    report["voxel_stats"] = {"n_voxels": int(mean.shape[0])}

    # ---- derived input views, CHAINED in the reference's order:
    # raw -> vc-mask -> per-voxel normalize -> pca (ThinkAndTell masks to
    # visual cortex, normalizes with data_mean.py stats at load time
    # (load_dataset.py:8-22), and SVD/svd.py reduces THAT data). Each enabled
    # stage consumes the previous stage's pack; transform.json records the
    # chain so `mtt transform` / apply_preprocess_chain can replay it on
    # arbitrary rows (serving requests, new sessions).
    chain: list[dict] = []
    view = store  # the current stage input

    def _write_view(name, row_fn, row_shape_note):
        pack_path = os.path.join(out_dir, name)

        def rows():
            data, keys = view.data, view.keys.tolist()
            for i in range(0, len(keys), 512):  # stream off the memmap
                block = row_fn(np.asarray(data[i:i + 512], np.float32))
                for j, key in enumerate(keys[i:i + 512]):
                    yield key, block[j]

        meta_ = write_pack(pack_path, None, rows())
        logger.info("preprocess: wrote %s (%s rows, %s)", name,
                    meta_["n_rows"], row_shape_note)
        return pack_path, meta_

    if vc_parcels:
        # the visual-cortex stage (ThinkAndTell/train.py:78-113 +
        # create_betas_dataset.py): mask the full-cortex rows down to the
        # visual parcels — the pack input_kind: vc configs train on
        from masters_thesis_tpu.data.preprocess.glasser import (
            load_atlas_vector,
            visual_cortex_mask,
        )

        nsd_dir = cfg.dataset.nsd_dir
        if not (nsd_dir and os.path.isdir(nsd_dir)):
            raise ValueError(
                "--vc-parcels needs dataset.nsd_dir with glasser_lh/rh "
                "atlas label vectors to build the vertex mask"
            )
        lh = load_atlas_vector(os.path.join(nsd_dir, "glasser_lh.npy"))
        rh = load_atlas_vector(os.path.join(nsd_dir, "glasser_rh.npy"))
        parcels = _parse_visual_parcels(vc_parcels)
        mask = visual_cortex_mask(lh, rh, parcels)
        width = view.row_shape[0]
        if len(lh) + len(rh) != width:
            raise ValueError(
                f"atlas covers {len(lh) + len(rh)} vertices but the pack "
                f"rows are {width}-wide — wrong atlas for this data"
            )
        if mask.size == 0:
            raise ValueError(
                f"visual parcels {parcels} match no atlas vertex")
        np.save(os.path.join(out_dir, "vc_mask.npy"), mask)
        vc_pack, vc_meta = _write_view(
            "betas_pack_vc", lambda b: b[:, mask],
            f"{mask.size} visual-cortex vertices")
        report["vc"] = {"n_vertices": int(mask.size), "pack": vc_pack,
                        "n_rows": vc_meta["n_rows"],
                        "parcels": sorted(set(parcels))}
        chain.append({"stage": "vc_mask", "file": "vc_mask.npy"})
        view = open_pack(vc_pack)

    if normalize:
        # per-voxel (x - mean)/std over the CURRENT view, the reference's
        # load-time normalization (load_dataset.py:8-22; stats from
        # data_mean.py). Stats come from the TRAIN rows when the split is
        # resolvable — computing them over val/test leaks those rows'
        # statistics into the training inputs (same rule as the PCA fit
        # below). std floors at 1e-8: a dead voxel divides by ~0 in the
        # reference and NaNs the row
        idx, stats_from = _train_split_indices(view, cfg.dataset.nsd_dir)
        stat_rows = (view.data if idx is None
                     else np.asarray(view.data)[idx])
        v_mean, v_std = voxelwise_stats(stat_rows)
        v_std = np.maximum(v_std, 1e-8)
        np.savez(os.path.join(out_dir, "norm_stats.npz"),
                 mean=v_mean, std=v_std)
        norm_pack, norm_meta = _write_view(
            "betas_pack_norm", lambda b: (b - v_mean) / v_std,
            "per-voxel normalized")
        report["normalize"] = {"pack": norm_pack,
                               "n_rows": norm_meta["n_rows"],
                               "n_voxels": int(v_mean.shape[0]),
                               "stats_from": stats_from}
        chain.append({"stage": "normalize", "file": "norm_stats.npz"})
        view = open_pack(norm_pack)

    if pca_components > 0:
        # fit on the unique-train rows when the key split is resolvable
        # (the reference fits on the 27k unique split then transforms both
        # splits, SVD/svd.py:64-93 — fitting on val/test leaks them into
        # the subspace); otherwise fit on every row and say so
        idx, fit_on = _train_split_indices(view, cfg.dataset.nsd_dir)
        fit_rows = (np.asarray(view.data) if idx is None
                    else np.asarray(view.data)[idx])
        model = fit_pca(fit_rows, pca_components)
        model.save(os.path.join(out_dir, "pca_model.npz"))
        # transform EVERY row into the reduced pack the pca configs train
        # on (input_kind: pca points dataset.betas_path here) — the model
        # alone is not a usable training input
        pca_pack, pca_meta = _write_view(
            "betas_pack_pca", model.transform,
            f"{model.components.shape[0]} components")
        report["pca"] = {"components": int(model.components.shape[0]),
                         "fit_on": fit_on, "pack": pca_pack,
                         "n_rows": pca_meta["n_rows"]}
        chain.append({"stage": "pca", "file": "pca_model.npz"})
        view = open_pack(pca_pack)

    with open(os.path.join(out_dir, "transform.json"), "w") as f:
        json.dump({"stages": chain,
                   "input_row_shape": list(store.row_shape),
                   "final_row_shape": list(view.row_shape)}, f, indent=1)
    report["transform"] = {"stages": [c["stage"] for c in chain]}

    if captions_path and os.path.isdir(captions_path):
        caps = load_captions_dir(captions_path)
        texts = [clean_caption(line) for lines in caps.values() for line in lines]
        tok = Tokenizer(num_words=cfg.top_k)
        tok.fit_on_texts(texts)
        tok.install_pad()
        tok.save(os.path.join(out_dir, "tokenizer.json"))
        report["tokenizer"] = corpus_stats(texts)
    return report


def corpus_stats(texts: list[str]) -> dict:
    """Word/vocab counts (CNN_RNN/count_words.py) plus caption-length
    statistics (caption_analysis.py::statistics — min/max/mean and the
    .25/.5/.75/.9/.99 percentiles its describe() prints)."""
    words = [w for t in texts for w in t.split()]
    lengths = np.asarray([len(t.split()) for t in texts], np.int64)
    stats = {
        "n_captions": len(texts),
        "n_words": len(words),
        "n_unique": len(set(words)),
    }
    if len(lengths):
        stats["caption_length"] = {
            "min": int(lengths.min()),
            "max": int(lengths.max()),
            "mean": float(lengths.mean()),
            **{f"p{int(q * 100)}": float(np.percentile(lengths, q * 100))
               for q in (0.25, 0.5, 0.75, 0.9, 0.99)},
        }
    return stats


def vocab_overlap(tok_a, tok_b, top_k: int = 5000) -> dict:
    """Fraction of tokenizer A's top-k vocabulary present in tokenizer B's
    top-k (caption_analysis.py::unique_words: 73k-corpus vocab vs one
    subject's vocab)."""
    def top_words(tok):
        pairs = sorted(tok.word_counts.items(), key=lambda x: x[1],
                       reverse=True)
        return [w for w, _ in pairs[:top_k]]

    a, b = top_words(tok_a), set(top_words(tok_b))
    overlap = sum(1 for w in a if w in b)
    return {
        "overlap": overlap,
        "total": len(a),
        "fraction": overlap / len(a) if a else 0.0,
    }


# ---------------------------------------------------------------- eval

def run_eval(bundle, run_path: str, epoch: int | None = None,
             decoder: str = "greedy", beam_width: int = 5,
             ms2_subject: str = "a"):
    """Test-set decoding (reference eval.py:147-193): writes
    output_captions_{e}.npy, attention scores, and decoded text.

    ``ms2_subject``: which per-subject encoder decodes an ms2_nic run's test
    set. The split layout is a TRAINING batch contract; the reference
    evaluates one subject at a time through that subject's encoder
    (ms2_NIC callA/callB)."""
    import jax.numpy as jnp

    cfg, model, tok = bundle["cfg"], bundle["model"], bundle["tokenizer"]
    state, store = bundle["state"], bundle["store"]

    from masters_thesis_tpu.models.multisubject import DualSubjectEncoder

    enc_mod = getattr(model, "encoder", None)
    if isinstance(enc_mod, DualSubjectEncoder) and enc_mod.mode == "split":
        import dataclasses

        logger.info("ms2 eval: decoding through encoder_%s", ms2_subject)
        model = dataclasses.replace(
            model, encoder=dataclasses.replace(enc_mod, mode=ms2_subject))
    pairs = bundle["pairs"]["test"] or bundle["pairs"]["val"]
    enc = encode_pairs(pairs, tok, cfg.max_length)
    bs = min(cfg.batch_size, len(enc))
    pipe = EvalPipeline(enc, store, bs)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if decoder == "greedy":
        import jax

        from masters_thesis_tpu.models.nic import NIC

        if (jax.default_backend() == "tpu" and cfg.tpu.use_pallas
                # round 5: kernel covers every NIC cell/init/embedding
                # variant (GRU, learned-init, frozen GloVe) — see
                # make_whole_fused_greedy_decoder
                and isinstance(model, NIC)):
            # serving fast path: whole-decode Pallas kernel — same tokens
            # (parity-tested), real per-step alphas for the attention
            # artifact; raw logits aren't consumed by the eval artifacts
            from masters_thesis_tpu.ops.fused_decode import (
                make_whole_fused_greedy_decoder,
            )

            fused = make_whole_fused_greedy_decoder(
                model, cfg.units, cfg.max_length, batch_tile=min(64, bs))

            def dec(variables, betas, start_id):
                words, alphas = fused(variables, betas, start_id)
                return words, None, alphas
        else:
            from masters_thesis_tpu.decode.greedy import make_greedy_decoder

            dec = make_greedy_decoder(model, cfg.units, cfg.max_length)
    else:
        # beam rides the XLA fixed-lattice scan: a whole-beam Pallas kernel
        # was built and measured SLOWER (PERF.md "whole-beam search kernel")
        from masters_thesis_tpu.decode.beam import make_beam_decoder

        dec = make_beam_decoder(
            model, cfg.units, cfg.max_length, beam_width=beam_width
        )

    all_words, all_attn, all_keys = [], [], []
    for batch in pipe.epoch():
        betas = (jnp.asarray(batch["betas"]) if "betas" in batch
                 else store.device_gather(batch["idx"]))
        if decoder == "greedy":
            words, _, attn = dec(variables, betas, tok.start_id)
        else:
            # beam returns the winning hypothesis' own attention trail
            # (reference eval saves attention maps, eval.py:181-190)
            words, _, attn, _, _ = dec(
                variables, betas, tok.start_id, tok.end_id
            )
        valid = batch["valid"]
        all_words.append(np.asarray(words)[valid])
        all_attn.append(np.asarray(attn)[valid])
        all_keys.append(batch["keys"][valid])

    words = np.concatenate(all_words)
    attn = np.concatenate(all_attn)
    keys = np.concatenate(all_keys)
    e = epoch if epoch is not None else bundle["manager"].latest_epoch() or 0
    np.save(os.path.join(run_path, f"output_captions_{e}.npy"), words)
    np.save(os.path.join(run_path, f"attention_scores_{e}.npy"), attn)
    texts = [None] * len(words)
    from masters_thesis_tpu.evalsuite.tokens import ids_to_caption

    with open(os.path.join(run_path, f"captions_{e}.txt"), "w") as f:
        for i, row in enumerate(words):
            texts[i] = ids_to_caption(row, tok)
            f.write(f"{keys[i]}\t{texts[i]}\n")
    return {"words": words, "keys": keys, "texts": texts, "epoch": e}


def run_guse_precompute(cfg: Config, out_dir: str,
                        per_key: bool = True) -> dict:
    """The reference's GUSE precompute driver (AttemptFour/get_guse.py
    __main__): embed every caption of every key, save the flat
    (N, C, 512) brick plus the per-key averaged vectors that the guse_NIC
    data path trains on (get_guse.py:104-140: guse_pre_processed.npy and
    guse_averaged/guse_embedding_KID{key}.npy).

    The embedder resolves exactly like run_metrics: the real USE-DAN when a
    weight bundle is present, otherwise the hash fallback — and meta.json
    records which one produced the files so hash output can never be
    mistaken for GUSE."""
    from masters_thesis_tpu.data.captions import load_captions_dir
    from masters_thesis_tpu.evalsuite.guse_sim import (
        default_embedder,
        embed_caption_table,
    )

    caps = load_captions_dir(cfg.dataset.captions_path)
    if not caps:
        raise FileNotFoundError(
            f"no KID*.txt caption files under {cfg.dataset.captions_path!r}")
    guse_dir = cfg.dataset.guse_path
    bundle_path = os.path.join(guse_dir, "use_dan.npz") if guse_dir else None
    embedder = default_embedder(
        bundle_path if bundle_path and os.path.exists(bundle_path) else None)
    keys, table = embed_caption_table(caps, embedder=embedder)

    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "guse_pre_processed.npy"), table)
    np.save(os.path.join(out_dir, "keys.npy"), keys)
    n_per_key = 0
    if per_key and len(keys):
        avg_dir = os.path.join(out_dir, "guse_averaged")
        os.makedirs(avg_dir, exist_ok=True)
        averaged = table.mean(axis=1)  # (N, 512), get_guse.py:94
        for key, vec in zip(keys, averaged):
            np.save(os.path.join(
                avg_dir, f"guse_embedding_KID{int(key)}.npy"), vec)
        n_per_key = len(keys)
    name = getattr(embedder, "name", type(embedder).__name__)
    meta = {
        "embedder": name,
        "is_real_guse": name == "use_dan",
        "n_keys": int(len(keys)),
        "captions_per_key": int(table.shape[1]) if table.ndim == 3 else 0,
        "dim": int(table.shape[-1]) if table.size else embedder.dim,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    logger.info("GUSE precompute: %d keys x %d captions -> %s (embedder=%s)",
                meta["n_keys"], meta["captions_per_key"], out_dir, name)
    return {**meta, "out": out_dir, "per_key_files": n_per_key}


def run_metrics(bundle, eval_out, captions_by_key=None) -> dict:
    """Reference metric_suit.py + guse_sim.py on the eval output.

    GUSE scores are labelled ``GUSE_*`` only when produced by the real
    USE-DAN encoder (models/use_encoder.py, weights resolved via
    MTT_GUSE_WEIGHTS or <guse_path>/use_dan.npz); the offline hash fallback
    reports as ``GUSE_hash_*`` so a word-overlap proxy can never be mistaken
    for the reference metric (get_guse.py:49-63)."""
    from masters_thesis_tpu.data.pairs import clean_caption
    from masters_thesis_tpu.evalsuite.guse_sim import labelled_guse_scores
    from masters_thesis_tpu.evalsuite.metric_suite import evaluate_captions

    if captions_by_key is None:
        # rebuild reference texts from the pair lists
        captions_by_key = {}
        for split_pairs in bundle["pairs"].values():
            for key, cap, cid, count, subj in split_pairs:
                captions_by_key.setdefault(int(key), []).append(
                    " ".join(cap.split()[1:-1])  # strip <start>/<end>
                )
    refs = [captions_by_key[int(k)] for k in eval_out["keys"]]
    scores = evaluate_captions(eval_out["texts"], refs)

    guse_dir = bundle["cfg"].dataset.guse_path
    bundle_path = os.path.join(guse_dir, "use_dan.npz") if guse_dir else None
    scores.update(labelled_guse_scores(
        eval_out["texts"], refs,
        weights_path=(bundle_path if bundle_path
                      and os.path.exists(bundle_path) else None)))
    return scores
