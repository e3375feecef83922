"""RoBERTa byte-level BPE tokenizer — pure-Python, host-side.

ref: common/nlp/roberta/tokenization_roberta.py:66 (vendored GPT-2 byte-level
BPE with RoBERTa special tokens; the reference's HTTP/S3 cache plumbing in
common/nlp/roberta/utils.py:159-283 is replaced by local paths). Parity is
tested against transformers' RobertaTokenizer.
"""

from __future__ import annotations

import json
import os
import re


def bytes_to_unicode():
    """GPT-2's reversible byte->unicode map."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


def get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


# GPT-2 pre-tokenization pattern
_PAT = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\w+| ?[^\s\w]+|\s+(?!\S)|\s+",
    re.UNICODE)


class RobertaTokenizer:
    def __init__(self, vocab_file, merges_file):
        with open(vocab_file, encoding="utf-8") as f:
            self.encoder = json.load(f)
        self.decoder = {v: k for k, v in self.encoder.items()}
        with open(merges_file, encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = [tuple(m.split()) for m in merges
                  if m and not m.startswith("#version")]
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.cache = {}
        self.special = {"<s>", "</s>", "<pad>", "<unk>", "<mask>"}

    # ------------------------------------------------------------- BPE core
    def bpe(self, token):
        if token in self.cache:
            return self.cache[token]
        word = tuple(token)
        pairs = get_pairs(word) if len(word) > 1 else set()
        while pairs:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1e10))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first \
                        and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def tokenize(self, text):
        out = []
        for token in _PAT.findall(text):
            btoken = "".join(self.byte_encoder[b]
                             for b in token.encode("utf-8"))
            out.extend(self.bpe(btoken).split(" "))
        return out

    def convert_tokens_to_ids(self, tokens):
        unk = self.encoder.get("<unk>", 3)
        return [self.encoder.get(t, unk) for t in tokens]

    def convert_ids_to_tokens(self, ids):
        return [self.decoder[i] for i in ids]

    def encode(self, text, add_special_tokens=True):
        ids = self.convert_tokens_to_ids(self.tokenize(text))
        if add_special_tokens:
            return [self.cls_id] + ids + [self.sep_id]
        return ids

    @property
    def cls_id(self):
        return self.encoder["<s>"]

    @property
    def sep_id(self):
        return self.encoder["</s>"]

    @property
    def mask_id(self):
        return self.encoder["<mask>"]

    @property
    def vocab(self):
        return self.encoder

    @classmethod
    def from_pretrained(cls, path):
        if os.path.isdir(path):
            return cls(os.path.join(path, "vocab.json"),
                       os.path.join(path, "merges.txt"))
        raise ValueError("pass a directory containing vocab.json + merges.txt")
