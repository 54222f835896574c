"""Pure-Python byte-level BPE tokenizer (GPT-2 / p50k_base family).

The reference counts result tokens precisely with tiktoken's p50k_base
(search_tokens.rs:333-430).  This sandbox has neither tiktoken nor network
access to the public vocab files, so the ALGORITHM is implemented here
from its public description (Sennrich et al. 2016 BPE; the GPT-2 byte-level
formulation: regex pre-tokenization, 256-byte base alphabet remapped to
printable unicode, greedy lowest-rank pair merging) and the VOCAB is
pluggable:

  * ``BPETokenizer.from_tiktoken("p50k_base")`` when tiktoken is installed
    -- exact parity by construction;
  * ``BPETokenizer.from_merges_file(path)`` for the public ``vocab.bpe``
    merges file (set PROBE_SPARK_BPE_MERGES to its path) -- exact p50k
    merges without the library;
  * ``BPETokenizer(merges=[...])`` with any merge list -- used by the unit
    tests, which pin the merge-order, byte-fallback, and pre-tokenizer
    semantics against hand-computed goldens.

The merge loop is the textbook greedy algorithm: repeatedly merge the
adjacent pair with the LOWEST rank until no ranked pair remains.  Token
count = number of symbols summed over pre-tokenized chunks.
"""

from __future__ import annotations

import os
import re
from functools import lru_cache

# GPT-2/p50k pre-tokenizer pattern.  The canonical pattern uses \p{L}/\p{N}
# (regex module classes); with the stdlib ``re`` the equivalents below use
# unicode-aware \w minus digits/underscore for letters and \d for numbers.
# p50k's punctuation class is [^\s\p{L}\p{N}], which INCLUDES '_' -- the
# stdlib [^\s\w] alone would drop underscores (they are in \w), so '_' is
# added to the punctuation alternative explicitly.  Closest stdlib
# expressible form of the canonical pattern.
_PRETOKEN_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+|\s+(?!\S)|\s+",
    re.UNICODE,
)


@lru_cache(maxsize=1)
def _bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte -> printable-unicode map: printable bytes
    map to themselves, the rest to 256+offset code points, so every byte
    string has a lossless text form the merge table can name."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


class BPETokenizer:
    """Byte-level BPE with a pluggable merge table."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.ranks: dict[tuple[str, str], int] = {
            tuple(m): i for i, m in enumerate(merges)
        }
        self._b2u = _bytes_to_unicode()
        self._cache: dict[str, int] = {}

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_merges_file(cls, path: str) -> "BPETokenizer":
        """Load a public ``vocab.bpe`` merges file (one 'a b' pair per
        line).  Only the ``#version`` header line is skipped: real merge
        lines can legitimately start with '#' (e.g. the merge producing
        '##'), so a blanket '#' filter would silently drop valid merges
        and diverge from tiktoken on '#'-heavy text."""
        merges: list[tuple[str, str]] = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("#version"):
                    continue
                a, _, b = line.partition(" ")
                merges.append((a, b))
        return cls(merges)

    @classmethod
    def from_tiktoken(cls, name: str = "p50k_base"):
        """tiktoken-backed counter (exact); None when not installed."""
        try:  # pragma: no cover - tiktoken absent in this sandbox
            import tiktoken

            enc = tiktoken.get_encoding(name)
            return lambda s: len(enc.encode(s))
        except Exception:
            return None

    # -- core ---------------------------------------------------------------

    def _bpe_count(self, chunk: str) -> int:
        """Number of BPE symbols for one pre-tokenized chunk."""
        hit = self._cache.get(chunk)
        if hit is not None:
            return hit
        word = [self._b2u[b] for b in chunk.encode("utf-8")]
        while len(word) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(word) - 1):
                r = self.ranks.get((word[i], word[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            # merge EVERY occurrence of the winning pair left-to-right
            pair = (word[best_i], word[best_i + 1])
            merged: list[str] = []
            i = 0
            while i < len(word):
                if (
                    i < len(word) - 1
                    and word[i] == pair[0]
                    and word[i + 1] == pair[1]
                ):
                    merged.append(pair[0] + pair[1])
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = merged
        n = len(word)
        if len(self._cache) > 100_000:
            self._cache.clear()
        self._cache[chunk] = n
        return n

    def count(self, text: str) -> int:
        return sum(self._bpe_count(c) for c in _PRETOKEN_RE.findall(text))

    def pretokenize(self, text: str) -> list[str]:
        return _PRETOKEN_RE.findall(text)


def resolve_counter():
    """Best available precise counter, in fidelity order: tiktoken's
    p50k_base -> a merges file named by PROBE_SPARK_BPE_MERGES -> None
    (bytes/4 estimate only, the reference's own fast path)."""
    tk = BPETokenizer.from_tiktoken("p50k_base")
    if tk is not None:  # pragma: no cover - tiktoken absent here
        return tk
    path = os.environ.get("PROBE_SPARK_BPE_MERGES")
    if path and os.path.exists(path):
        return BPETokenizer.from_merges_file(path).count
    return None
