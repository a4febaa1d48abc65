"""Build the full-coverage char→TONE3 pinyin table asset.

The reference derives pinyin for *every* Chinese char at runtime from
pypinyin (reference: src/utils.py:26-31 — Style.TONE3,
``neutral_tone_with_five=True``); pypinyin is not available in this
environment, so the TPU build ships a precomputed table instead. This tool
merges three sources, in priority order:

1. ``assets/pinyin_core.tsv`` — the original curated table (pypinyin-parity
   readings for the most frequent ~1.7k chars, including the polyphone
   choices pypinyin makes, e.g. 还→hai2, 什→shen2).
2. ``assets/pinyin_gb2312.tsv`` — hand-authored readings for all 6763
   GB2312 chars (level 1 is pinyin-ordered in the charset itself, which
   anchors the readings; level 2 by per-char knowledge).
3. Anchor inference over the CLDR pinyin collation shipped with Perl
   (`Unicode::Collate::CJK::Pinyin` — ~21k CJK chars in pinyin order):
   any char sandwiched between two anchors with the *same* known reading
   gets that reading; chars at group boundaries fall back to the nearest
   anchor's reading (base syllable is then certain up to the boundary,
   tone is best-effort). This extends coverage to traditional and rare
   chars (the BERT-Chinese vocab contains both) without any network access.

A small traditional→simplified transfer from the glyph pipeline's S2T map
runs before anchor inference because it is exact.

Output: ``assets/pinyin_table.tsv`` (char<TAB>tone3), the runtime asset
loaded by realise_tpu.text.pinyin.
"""

from __future__ import annotations

import os
import re
import sys

ASSETS = os.path.join(os.path.dirname(__file__), "..", "realise_tpu", "text", "assets")
PERL_COLLATION = "/usr/share/perl/5.36.0/Unicode/Collate/CJK/Pinyin.pm"
TONE3_RE = re.compile(r"[a-z]+[1-5]$")


def load_tsv(path):
    table = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            ch, py = line.split("\t")
            assert TONE3_RE.fullmatch(py), (ch, py)
            table[ch] = py
    return table


def is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return (
        0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
        or 0xF900 <= cp <= 0xFAFF or 0x20000 <= cp <= 0x2A6DF
    )


def collation_order(path=PERL_COLLATION):
    """All CJK chars of the CLDR pinyin collation, in pinyin order."""
    with open(path, encoding="utf-8", errors="replace") as f:
        data = f.read().split("__DATA__")[1].split("__END__")[0]
    chars = []
    for tok in data.split():
        if "-" in tok:  # FDD0-00xx index markers
            continue
        ch = chr(int(tok, 16))
        if is_cjk(ch):
            chars.append(ch)
    return chars


def s2t_pairs():
    from realise_tpu.text.glyphs import _S2T_BUILTIN

    return _S2T_BUILTIN


def build():
    table = load_tsv(os.path.join(ASSETS, "pinyin_gb2312.tsv"))
    # Curated traditional-char readings (anchor inference alone is ~96%
    # accurate on these; the curated list makes the frequent ones exact).
    table.update(load_tsv(os.path.join(ASSETS, "pinyin_trad.tsv")))
    core = load_tsv(os.path.join(ASSETS, "pinyin_core.tsv"))
    table.update(core)  # curated pypinyin-parity readings win

    # Exact traditional→simplified reading transfer.
    for simp, trad in s2t_pairs().items():
        if trad not in table and simp in table:
            table[trad] = table[simp]

    order = collation_order()
    known_idx = [i for i, c in enumerate(order) if c in table]
    n_inferred_exact = n_inferred_near = 0
    for i, ch in enumerate(order):
        if ch in table:
            continue
        # nearest known anchors on each side
        import bisect

        j = bisect.bisect_left(known_idx, i)
        left = order[known_idx[j - 1]] if j > 0 else None
        right = order[known_idx[j]] if j < len(known_idx) else None
        lr = table.get(left) if left else None
        rr = table.get(right) if right else None
        if lr and lr == rr:
            table[ch] = lr
            n_inferred_exact += 1
        elif lr or rr:
            # boundary: base syllable certain up to the boundary side;
            # take the nearest anchor's reading (tone best-effort).
            ld = i - known_idx[j - 1] if j > 0 else 1 << 30
            rd = known_idx[j] - i if j < len(known_idx) else 1 << 30
            table[ch] = lr if ld <= rd else rr
            n_inferred_near += 1

    out = os.path.join(ASSETS, "pinyin_table.tsv")
    with open(out, "w", encoding="utf-8") as f:
        for ch in sorted(table, key=ord):
            f.write(f"{ch}\t{table[ch]}\n")
    print(f"wrote {out}: {len(table)} entries "
          f"(core={len(core)}, exact-inferred={n_inferred_exact}, "
          f"boundary-inferred={n_inferred_near})")


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    build()
