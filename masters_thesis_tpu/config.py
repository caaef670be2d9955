"""Config system.

The public configuration surface is YAML with the same schema as the
reference's ``AttemptFour/config.yaml`` (/root/reference/AttemptFour/config.yaml:1-60):
run name, dataset paths, seed, training hyperparameters, dropout rates, L2
regularisers, input sizes and model sizes. Extra TPU-specific keys (mesh shape,
precision, pipeline options) live under the ``tpu:`` section and default
sensibly so reference configs load unchanged.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any

import yaml


@dataclass
class DatasetConfig:
    """Data-store paths (reference config.yaml:16-22)."""

    betas_path: str = ""
    captions_path: str = ""
    # second subject (ms2_nic real runs, main_ms.py:67-94: each subject has
    # its own betas dir + caption files). captions_path_b defaults to
    # captions_path when the caption corpus is shared.
    betas_path_b: str = ""
    captions_path_b: str = ""
    vgg16_path: str = ""
    guse_path: str = ""
    nsd_dir: str = ""
    images_path: str = ""   # stimulus pictures KID{key}.(png|jpg|npy) for
    #                         epoch-end caption-on-image previews (soloist
    #                         TensorBoardCaption.py:38 feed_pics_dir)
    synthetic: str = ""     # "" (independent-noise fixtures) | "structured"
    #                         (betas encode the captions' latent factors —
    #                         data/synthetic.py structured mode; held-out
    #                         caption metrics can then genuinely converge)
    #                         | "compositional" (round 5: val/test keys use
    #                         UNSEEN factor combinations, so the caption-
    #                         metric ceiling sits below 1.0 and the curve
    #                         can rank models)


@dataclass
class InputConfig:
    """Input-width options (reference config.yaml:48-53)."""

    full: int = 327_684
    vc: int = 62_756
    pca: int = 5_000
    mscoco: int = 4_096


@dataclass
class TPUConfig:
    """TPU-native knobs; absent from the reference (new surface)."""

    mesh_data: int = 1          # data-parallel axis size
    mesh_model: int = 1         # model-parallel axis size (brain-region sharding)
    param_dtype: str = "float32"
    compute_dtype: str = "float32"   # bfloat16 for speed once parity is locked
    donate_state: bool = True
    prefetch_depth: int = 2
    use_pallas: bool = True          # Pallas kernels where measured faster:
    #                                  the DMA store gather (ops/gather.py)
    #                                  and the whole-decode serving kernel
    #                                  (ops/fused_decode.py); False forces
    #                                  plain-XLA paths everywhere
    fused_seq: bool = False          # route the teacher-forced decoder
    #                                  through the fused sequence step's
    #                                  custom VJP (ops/fused_seq.py):
    #                                  backward carries only (dh, dc) and
    #                                  weight grads become stacked
    #                                  (B*T)-row einsums. Measured ~1.4x
    #                                  the XLA-autodiff scan at MXU-filling
    #                                  dims (units 2048/batch 256: 53.3 ->
    #                                  37.4 ms decoder fwd+bwd), neutral
    #                                  within noise at the flagship
    #                                  batch-64 contract — enable for
    #                                  large-units/large-batch configs.
    #                                  LSTM/zero-init/trainable-embedding
    #                                  family, fp32 compute; other configs
    #                                  fall back to the autodiff scan.
    #                                  Attention-dropout masks ride a
    #                                  different (iid) stream than flax's
    #                                  (same caveat class as prng_impl).
    remat: bool = False              # jax.checkpoint the decoder's per-
    #                                  timestep scan body (NIC family): the
    #                                  backward pass recomputes attention+cell
    #                                  steps instead of storing T activation
    #                                  sets — trades FLOPs for HBM
    scan_steps: int = 0              # >0: run K optimisation steps per device
    #                                  call (needs a device-resident store)
    profile_steps: int = 0           # >0: record wall-time stats for steps
    #                                  [10, 10+N) -> <run>/profile.json (the
    #                                  reference's commented-out profile_batch,
    #                                  main.py:210)
    profile_trace: bool = False      # capture a JAX profiler (XPlane) trace
    #                                  of the first epoch -> <run>/trace/
    compile_cache_dir: str = "~/.cache/masters_thesis_tpu/xla"
    #                                  persistent XLA compile cache: first
    #                                  flagship compiles run minutes on
    #                                  remote/tunneled TPU runtimes; cached
    #                                  runs start hot. "" disables.
    prng_impl: str = "default"       # 'rbg' uses the TPU's hardware RNG for
    #                                  dropout masks: +21% flagship steps/s
    #                                  measured (threefry mask generation was
    #                                  ~a fifth of the step). Different
    #                                  dropout stream than threefry; key
    #                                  shapes differ too, so resume a run
    #                                  with the impl it started with
    store_dtype: str = "float32"     # HBM beta-store dtype; bfloat16 halves
    #                                  the per-step gather bytes (the probed
    #                                  bottleneck) at ~3 decimal digits of
    #                                  input precision
    ckpt_every: int = 1              # checkpoint cadence in epochs. 1 = the
    #                                  reference's per-epoch latest+best saves
    #                                  (main.py:167-190). N>1 saves every N
    #                                  epochs plus the final epoch; best-by-
    #                                  val-loss is then tracked among SAVED
    #                                  epochs only (Keras save_freq
    #                                  semantics). Useful when checkpoint
    #                                  host transfer contends with training
    #                                  (each flagship save ships ~140 MB of
    #                                  params+opt state to the host; on a
    #                                  tunneled runtime that saturates the
    #                                  link across the next epoch's steps).
    vocab_pad_multiple: int = 0      # >1: round the model's vocab axis
    #                                  (embedding rows, dense_out cols) up to
    #                                  a multiple of this so tensor-parallel
    #                                  meshes can shard it — the reference
    #                                  vocab 5001 divides no power-of-two
    #                                  model axis. Padded rows/cols are
    #                                  zero-init, get zero gradient (logits
    #                                  masked to -1e9), and stay zero, so
    #                                  loss/decode numerics match unpadded
    #                                  exactly. Checkpoints record the padded
    #                                  shape: resume with the same multiple.


@dataclass
class Config:
    """Full run configuration, schema-compatible with the reference."""

    # Run identity (config.yaml:2-5)
    run: str = "run"
    info: str = ""
    log: str = "./Log/"

    dataset: DatasetConfig = field(default_factory=DatasetConfig)

    seed: int = 42

    # Training (config.yaml:26-34)
    epochs: int = 100
    batch_size: int = 64
    max_length: int = 15
    top_k: int = 5_000
    optimizer: str = "Adam"
    alpha: float = 1.0e-4            # learning rate
    clipnorm: float = 0.1            # per-tensor clipnorm (Keras semantics)
    decay: float = 0.0
    warmup_steps: int = 0            # linear LR warmup (WarmupScheduler.py)
    cosine_decay_steps: int = 0      # >0: cosine LR decay over N steps
    #                                  (ThinkAndTell SGD+CosineDecay,
    #                                   train.py:247-264)
    beta_1: float = 0.9
    beta_2: float = 0.98
    epsilon: float = 1.0e-8          # main.py:97 uses 10.0e-9

    # Dropout (config.yaml:36-41)
    dropout_input: float = 0.0
    dropout_features: float = 0.2
    dropout_text: float = 0.2
    dropout_lstm: float = 0.2
    dropout_attn: float = 0.2
    dropout_out: float = 0.2

    # L2 regularisers (config.yaml:43-46)
    input_reg: float = 0.01
    attn_reg: float = 0.001
    lstm_reg: float = 3.0e-5
    output_reg: float = 1.0e-5

    input: InputConfig = field(default_factory=InputConfig)

    # Model sizes (config.yaml:55-60)
    units: int = 512
    attn_units: int = 32
    group_size: int = 32
    embedding_features: int = 512
    embedding_text: int = 512

    # Model/data selection (new; the reference hard-codes these per script)
    model: str = "lc_nic"            # lc_nic | ms_nic | ms2_nic | img_nic |
    #                                  guse_nic | showtell | cnn_rnn
    groups_to_remove: list = field(default_factory=list)
    #                                  Glasser group indices dropped before the
    #                                  encoder is built; the reference flagship
    #                                  trains on 345 of 360 (main.py:115:
    #                                  select_groups(..., remove=[142,17,...]))
    input_kind: str = "full"         # full | vc | pca | mscoco
    attn_loss: bool = False          # train_step has it commented out (lc_NIC.py:384)
    sam_rho: float = 0.0             # >0 enables SAM (lc_NIC.py:713-838)
    agc_clip: float = 0.0            # >0 enables adaptive gradient clipping (agc.py)
    caption_metrics_every: int = 0   # >0: every N epochs greedy-decode the
    #                                  val split and log corpus BLEU-1/4 +
    #                                  CIDEr to metrics.jsonl + run_meta (the
    #                                  reference's train->eval->metric_suit
    #                                  loop tracked DURING training)
    warm_start: str = ""             # run dir to preload matching weights from
    #                                  (load_weights by_name/skip_mismatch,
    #                                   main.py:150-163)
    learned_init_state: bool = False  # h0/c0 = MLP(mean(features)) instead of
    #                                  zeros — the init-from-features variant
    #                                  (tmp_lc_NIC.py:191; Xu et al.)
    glove_path: str = ""             # pretrained text-embedding table
    #                                  (glove_NIC.py): a .npy loads as a
    #                                  prebuilt (vocab_size, E) table, any
    #                                  other path parses as GloVe txt filtered
    #                                  to the run tokenizer's vocab
    glove_trainable: bool = True     # False freezes the table (a module
    #                                  constant, not a checkpointed param)

    tpu: TPUConfig = field(default_factory=TPUConfig)

    # ---- derived ----
    @property
    def vocab_size(self) -> int:
        """top_k + 1, matching the reference (main.py: vocab_size = top_k + 1)."""
        return self.top_k + 1

    @property
    def padded_vocab_size(self) -> int:
        """vocab_size rounded up to tpu.vocab_pad_multiple (model axis size
        for TP sharding); == vocab_size when padding is off."""
        m = self.tpu.vocab_pad_multiple
        v = self.vocab_size
        return -(-v // m) * m if m and m > 1 else v

    def input_dim(self) -> int:
        return getattr(self.input, self.input_kind)

    # ---- (de)serialisation ----
    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    def save(self, path: str | os.PathLike) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)

    @classmethod
    def from_dict(cls, raw: dict[str, Any]) -> "Config":
        raw = dict(raw or {})
        known = {f.name for f in dataclasses.fields(cls)}
        sub = {
            "dataset": DatasetConfig,
            "input": InputConfig,
            "tpu": TPUConfig,
        }
        kwargs: dict[str, Any] = {}
        for key, val in raw.items():
            if key not in known:
                continue  # tolerate unknown reference keys
            if key in sub:
                # an empty `tpu:` section parses as None — use defaults
                # rather than propagating None into the run
                val = val or {}
                if not isinstance(val, dict):
                    raise TypeError(f"config section {key!r} must be a "
                                    f"mapping, got {type(val).__name__}")
                fields = {f.name for f in dataclasses.fields(sub[key])}
                kwargs[key] = sub[key](**{k: v for k, v in val.items() if k in fields})
            else:
                kwargs[key] = val
        return cls(**kwargs)

    @classmethod
    def load(cls, path: str | os.PathLike) -> "Config":
        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f))


def load_config(path: str | os.PathLike) -> Config:
    return Config.load(path)
