from masters_thesis_tpu.config import Config


def test_defaults_match_reference_schema():
    c = Config()
    assert c.vocab_size == 5001
    assert c.batch_size == 64
    assert c.max_length == 15
    assert c.input.full == 327_684
    assert c.input_dim() == 327_684


def test_round_trip(tmp_path):
    c = Config(run="t", top_k=60, batch_size=8)
    c.tpu.mesh_data = 4
    p = tmp_path / "config.yaml"
    c.save(p)
    c2 = Config.load(p)
    assert c2.run == "t"
    assert c2.top_k == 60
    assert c2.tpu.mesh_data == 4
    assert c2.vocab_size == 61


def test_loads_reference_style_yaml(tmp_path):
    # subset of the reference config.yaml keys, plus unknown keys tolerated
    p = tmp_path / "ref.yaml"
    p.write_text(
        """
run: multi_subject_baseline
seed: 42
epochs: 100
batch_size: 64
max_length: 15
top_k: 5000
optimizer: Adam
alpha: 0.0001
clipnorm: 0.1
dropout_features: 0.2
input_reg: 0.01
input:
  full: 327684
  vc: 62756
  pca: 5000
  mscoco: 4096
units: 512
attn_units: 32
group_size: 32
embedding_features: 512
embedding_text: 512
dataset:
  betas_path: "/x/betas"
  captions_path: "/x/caps"
some_unknown_key: 17
"""
    )
    c = Config.load(p)
    assert c.run == "multi_subject_baseline"
    assert c.dataset.betas_path == "/x/betas"
    assert c.units == 512


def test_apply_tpu_runtime_config_compile_cache(tmp_path, monkeypatch):
    import jax

    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu import experiment
    from masters_thesis_tpu.experiment import apply_tpu_runtime_config

    before = jax.config.jax_compilation_cache_dir
    # cache applies only on TPU backends (CPU AOT cache entries are keyed
    # loosely and can load with machine-feature mismatches)
    cfg = Config()
    cfg.tpu.compile_cache_dir = str(tmp_path / "xla_cache")
    apply_tpu_runtime_config(cfg)
    assert jax.config.jax_compilation_cache_dir == before
    assert not (tmp_path / "xla_cache").exists()

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    apply_tpu_runtime_config(cfg)
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "xla_cache")
    assert (tmp_path / "xla_cache").is_dir()
    # "" leaves the existing setting untouched (disable = don't configure)
    cfg2 = Config()
    cfg2.tpu.compile_cache_dir = ""
    apply_tpu_runtime_config(cfg2)
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "xla_cache")
