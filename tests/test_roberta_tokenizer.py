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


# pools chosen to hit every GPT-2 pre-tokenizer alternative and the exact
# divergences VERDICT r4 confirmed for the old \w+ substitute: letter/digit
# boundaries ("abc123"), underscores ("snake_case"), unicode letters and
# digits outside ASCII, contractions, multi-space/tab/newline runs
_FUZZ_WORDS = [
    "the", "cat", "abc123", "4b", "room", "snake_case", "x_1", "don't",
    "it's", "we're", "I'll", "I'd", "café", "naïve", "中文", "日本語",
    "Ⅷ", "٣٤٥", "½", "１２３", "e=mc2", "foo-bar", "a.b.c", "#tag",
    "@user", "$100", "100%", "3.14", "...", "!!", "(x)", "[y]", "a_b_c",
    "CamelCase", "UPPER", "mixedCASE99", "_lead", "trail_", "__dunder__",
]
_FUZZ_SEPS = [" ", "  ", "   ", "\t", "\n", " \n ", "", " \t"]


def _fuzz_strings(n, seed=0):
    import random

    rng = random.Random(seed)
    out = []
    for _ in range(n):
        k = rng.randint(1, 8)
        s = ""
        for i in range(k):
            if i:
                s += rng.choice(_FUZZ_SEPS)
            s += rng.choice(_FUZZ_WORDS)
        if rng.random() < 0.2:
            s = rng.choice(_FUZZ_SEPS) + s
        if rng.random() < 0.2:
            s += rng.choice(_FUZZ_SEPS)
        out.append(s)
    return out


def test_roberta_fuzz_parity_with_transformers(roberta_files):
    """1000-case fuzz vs transformers (VERDICT r4 item 2): token-identical
    on alphanumeric/underscore/unicode/contraction/whitespace mixes. The
    old \\w+ pre-tokenizer fails this on the first 'abc123' draw."""
    from transformers import RobertaTokenizer as HFRoberta

    hf = HFRoberta(vocab_file=roberta_files + "/vocab.json",
                   merges_file=roberta_files + "/merges.txt")
    ours = RobertaTokenizer.from_pretrained(roberta_files)
    for text in _fuzz_strings(1000):
        assert ours.tokenize(text) == hf.tokenize(text), repr(text)


def test_pretokenize_scan_matches_regex_module():
    """The stdlib fallback scanner must reproduce the regex-module pattern
    exactly (it is the no-dependency path on hosts without `regex`)."""
    import regex

    from vlbert_tpu.data.tokenization_roberta import (_GPT2_PAT,
                                                      _pretokenize_scan)

    pat = regex.compile(_GPT2_PAT)
    cases = _fuzz_strings(500, seed=1) + [
        "", " ", "  ", "a", " a", "  a", "a ", "a  ", "\n\n a", "a\t\tb",
        "'s's", "''", "don't've", "1'2", " 'll",
        # U+001C-U+001F: str.isspace() True but regex \s False — the one
        # BMP-wide divergence between the two whitespace definitions
        # (scanner must treat them as 'other', not whitespace)
        "\x1c'lla", "a\x1d1", "\x1e\x1f", " \x1c", "\x1c ", "a \x1db",
    ]
    import random
    rng = random.Random(7)
    alpha = list("ab1 _'\t\n\x1c\x1d\x1e\x1f.") + ["'ll"]
    cases += ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 10)))
              for _ in range(300)]
    for text in cases:
        assert pat.findall(text) == _pretokenize_scan(text), repr(text)
