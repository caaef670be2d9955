import json

import numpy as np
import pytest

from masters_thesis_tpu.data.tokenizer import (
    KERAS_FILTERS,
    Tokenizer,
    pad_sequences,
    text_to_word_sequence,
)


def test_word_sequence_filters_and_lower():
    assert text_to_word_sequence("A man, (riding) a Horse!") == [
        "a", "man", "riding", "a", "horse",
    ]
    # '<' '>' are NOT filtered — special tokens survive
    assert text_to_word_sequence("<start> hi <end>") == ["<start>", "hi", "<end>"]


def test_fit_assigns_oov_id_1_and_frequency_order():
    tok = Tokenizer(num_words=5)
    tok.fit_on_texts(["b b b a a c", "c d"])
    # oov first, then by count desc with stable ties
    assert tok.word_index["<unk>"] == 1
    assert tok.word_index["b"] == 2
    assert tok.word_index["a"] == 3
    assert tok.word_index["c"] == 4
    assert tok.word_index["d"] == 5


def test_num_words_cutoff_maps_to_oov():
    tok = Tokenizer(num_words=4)  # valid ids 1..3
    tok.fit_on_texts(["b b b a a c", "c d"])
    seqs = tok.texts_to_sequences(["b a c d zzz"])
    # c has id 4 -> oov(1); d id 5 -> oov; unknown -> oov
    assert seqs == [[2, 3, 1, 1, 1]]
    assert tok.sequences_to_texts([[2, 3, 1]]) == ["b a <unk>"]


def test_install_pad_round_trip_json():
    tok = Tokenizer(num_words=10)
    tok.fit_on_texts(["<start> a dog <end>", "<start> a cat <end>"])
    tok.install_pad()
    assert tok.word_index["<pad>"] == 0
    restored = Tokenizer.from_json(tok.to_json())
    assert restored.word_index == tok.word_index
    assert restored.index_word == tok.index_word
    assert restored.num_words == tok.num_words
    assert restored.texts_to_sequences(["a dog zzz"]) == tok.texts_to_sequences(
        ["a dog zzz"]
    )


def test_keras_json_format_loadable():
    # emulate a Keras-written file: config values are JSON strings
    tok = Tokenizer(num_words=8)
    tok.fit_on_texts(["a b c a"])
    payload = json.loads(tok.to_json())
    assert isinstance(payload["config"]["word_index"], str)
    tok2 = Tokenizer.from_json(json.dumps(payload))
    assert tok2.word_index == tok.word_index


def test_pad_sequences_post():
    out = pad_sequences([[1, 2], [3, 4, 5, 6, 7]], maxlen=4)
    np.testing.assert_array_equal(out, [[1, 2, 0, 0], [3, 4, 5, 6]])
    assert out.dtype == np.int32


@pytest.mark.parametrize("char", sorted(set(KERAS_FILTERS) - {" "}))
def test_every_filter_char_removed(char):
    assert text_to_word_sequence(f"a{char}b") == ["a", "b"]
