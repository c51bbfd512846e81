"""SMALL100 tokenizer (whisperlive_tpu/small100_tokenizer.py).

Hermetic: builds a toy SentencePiece-BPE model file + vocab.json in-test
(no sentencepiece wheel exists in this environment; the module implements
the proto format and the BPE inference itself). Covers the behaviors the
reference vendors 364 lines of PreTrainedTokenizer subclass for
(whisper_live/backend/tokenization_small100.py): the id layout with
language tokens at encoder_size+i, the target-language-on-SOURCE prefix,
eos suffix, and checkpoint-layout detection.
"""

import json
import os

import numpy as np
import pytest

from whisperlive_tpu.small100_tokenizer import (
    FAIRSEQ_LANGUAGE_CODES,
    SMALL100Tokenizer,
    SPMBpe,
    is_small100_checkpoint,
    load_checkpoint_tokenizer,
    read_spm_model,
    write_spm_model,
)

U = "▁"  # SPIECE_UNDERLINE


@pytest.fixture()
def toy_dir(tmp_path):
    # toy BPE: characters + a few merged pieces with scores; higher score
    # merges first
    pieces = [
        ("<unk>", 0.0, 2),   # control pieces never merge
        ("<s>", 0.0, 3),
        ("</s>", 0.0, 3),
        (U, -1.0, 1),
        ("h", -2.0, 1), ("e", -2.0, 1), ("l", -2.0, 1), ("o", -2.0, 1),
        ("w", -2.0, 1), ("r", -2.0, 1), ("d", -2.0, 1),
        ("he", -0.5, 1), ("ll", -0.6, 1), ("hell", -0.4, 1),
        ("hello", -0.2, 1), (U + "hello", -0.1, 1),
        (U + "w", -0.9, 1), ("or", -0.8, 1), ("ld", -0.85, 1),
        (U + "world", -0.15, 1),
        ("orld", -0.7, 1), (U + "worl", -3.0, 1),
    ]
    spm_path = str(tmp_path / "sentencepiece.bpe.model")
    write_spm_model(spm_path, pieces)

    # vocab.json: fairseq layout — specials then pieces (ids are vocab.json's
    # business, independent of spm order)
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    for p, _, t in pieces:
        if t == 1 and p not in vocab:
            vocab[p] = len(vocab)
    with open(tmp_path / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(tmp_path / "tokenizer_config.json", "w") as f:
        json.dump({"tokenizer_class": "SMALL100Tokenizer"}, f)
    return str(tmp_path), vocab


def test_spm_model_round_trip(tmp_path):
    pieces = [("<unk>", 0.0, 2), (U + "ab", -0.25, 1), ("c", -1.5, 1)]
    path = str(tmp_path / "m.model")
    write_spm_model(path, pieces)
    got = read_spm_model(path)
    assert [(p, t) for p, _, t in got] == [(p, t) for p, _, t in pieces]
    np.testing.assert_allclose([s for _, s, _ in got], [s for _, s, _ in pieces],
                               rtol=1e-6)


def test_bpe_greedy_highest_score_merges(toy_dir):
    d, _ = toy_dir
    bpe = SPMBpe(read_spm_model(os.path.join(d, "sentencepiece.bpe.model")))
    # "hello world" -> ▁hello + ▁world via the scored merge path
    assert bpe.encode("hello world") == [U + "hello", U + "world"]
    # unknown chars stay as single symbols
    out = bpe.encode("held")
    assert "".join(out) == U + "held"
    assert bpe.decode([U + "hello", U + "world"]) == "hello world"


def test_small100_layout_and_source_encoding(toy_dir):
    d, vocab = toy_dir
    tok = SMALL100Tokenizer.from_pretrained(d, tgt_lang="de")
    enc_size = len(vocab)
    # language ids fill [encoder_size, encoder_size+100) in fairseq order
    assert tok.get_lang_id("af") == enc_size
    assert tok.get_lang_id("de") == enc_size + FAIRSEQ_LANGUAGE_CODES.index("de")
    assert tok.vocab_size == enc_size + len(FAIRSEQ_LANGUAGE_CODES) + 8

    ids = tok.encode("hello world")
    # SMALL100's defining behavior: [__tgt_lang__] + X + [eos]
    assert ids[0] == tok.get_lang_id("de")
    assert ids[-1] == tok.eos_token_id
    assert ids[1:-1] == [vocab[U + "hello"], vocab[U + "world"]]

    # switching tgt_lang switches the prefix
    tok.tgt_lang = "fr"
    assert tok.encode("hello world")[0] == tok.get_lang_id("fr")
    with pytest.raises(ValueError):
        tok.tgt_lang = "xx"

    # target mode: no prefix
    assert tok.encode_target("hello world")[:-1] == ids[1:-1]

    # decode drops specials and restores spacing
    assert tok.decode(ids) == "hello world"
    assert "__fr__" in tok.decode(
        [tok.get_lang_id("fr")] + ids[1:], skip_special_tokens=False
    )


def test_call_interface_and_batch_decode(toy_dir):
    d, _ = toy_dir
    tok = SMALL100Tokenizer.from_pretrained(d, tgt_lang="es")
    out = tok("hello world")
    assert out["input_ids"][0][0] == tok.get_lang_id("es")
    assert out["attention_mask"][0] == [1] * len(out["input_ids"][0])
    assert tok.batch_decode([out["input_ids"][0]]) == ["hello world"]


def test_checkpoint_detection_and_loader(toy_dir, tmp_path):
    d, _ = toy_dir
    assert is_small100_checkpoint(d)
    tok = load_checkpoint_tokenizer(d)
    assert isinstance(tok, SMALL100Tokenizer)
    # a dir without the SMALL100 layout is not detected
    other = tmp_path / "plain"
    other.mkdir(exist_ok=True)
    assert not is_small100_checkpoint(str(other))


def test_unknown_tokens_map_to_unk(toy_dir):
    d, _ = toy_dir
    tok = SMALL100Tokenizer.from_pretrained(d, tgt_lang="en")
    ids = tok.encode("zzz")
    assert tok.unk_token_id in ids
