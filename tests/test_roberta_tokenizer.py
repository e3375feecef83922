"""RoBERTa BPE tokenizer parity vs transformers on a tiny local vocab."""

import json

import pytest

from vlbert_tpu.data.tokenization_roberta import RobertaTokenizer, bytes_to_unicode


@pytest.fixture
def roberta_files(tmp_path):
    b2u = bytes_to_unicode()
    sp = b2u[ord(" ")]  # 'Ġ'
    base_tokens = ["<s>", "<pad>", "</s>", "<unk>", "<mask>"]
    pieces = ["t", "h", "e", "c", "a", "s", "o", "n", "d", "g", "r", "i",
              "w", ".", ",", sp,
              "th", "the", f"{sp}t", f"{sp}th", f"{sp}the",
              "ca", "cat", f"{sp}c", f"{sp}ca", f"{sp}cat",
              "sa", "sat", f"{sp}s", f"{sp}sa", f"{sp}sat",
              "on", f"{sp}o", f"{sp}on",
              "do", "dog", f"{sp}d", f"{sp}do", f"{sp}dog"]
    vocab = {t: i for i, t in enumerate(base_tokens + pieces)}
    merges = [
        "t h", "th e", f"{sp} t", f"{sp}t h", f"{sp}th e",
        "c a", "ca t", f"{sp} c", f"{sp}c a", f"{sp}ca t",
        "s a", "sa t", f"{sp} s", f"{sp}s a", f"{sp}sa t",
        "o n", f"{sp} o", f"{sp}o n",
        "d o", "do g", f"{sp} d", f"{sp}d o", f"{sp}do g",
    ]
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n" + "\n".join(merges) + "\n")
    return str(tmp_path)


def test_roberta_parity_with_transformers(roberta_files):
    from transformers import RobertaTokenizer as HFRoberta

    hf = HFRoberta(vocab_file=roberta_files + "/vocab.json",
                   merges_file=roberta_files + "/merges.txt")
    ours = RobertaTokenizer.from_pretrained(roberta_files)

    cases = ["the cat sat on the dog", "the cat.", "dog, cat", "cat"]
    for text in cases:
        assert ours.tokenize(text) == hf.tokenize(text), text
        assert (ours.convert_tokens_to_ids(ours.tokenize(text))
                == hf.convert_tokens_to_ids(hf.tokenize(text)))
    assert ours.encode("the cat") == hf.encode("the cat")
