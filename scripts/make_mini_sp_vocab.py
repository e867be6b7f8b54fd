"""Regenerate tests/assets/siglip_vocab/c4_en_32000.json — a miniature
T5-style fast tokenizer used to exercise the SigLIP tokenizer path offline.

The real c4-en vocab (cc_en.32000 sentencepiece, reference
`tokenizer.py:464-528`) needs a network download; the suite instead points
$REFINING_CLIP_VOCAB_DIR at this asset, which has the same *structure*
(Unigram + Metaspace, pad=0 `<pad>`, eos=1 `</s>`, unk=2 `<unk>`, `</s>`
appended) with a tiny vocabulary. Token IDS DO NOT MATCH the real c4-en —
this is test plumbing, not a parity vocab; for real SigLIP inference place
the genuine `.model` in $REFINING_CLIP_VOCAB_DIR (see SigLipTokenizer
docstring for the full resolution chain).

Run: python scripts/make_mini_sp_vocab.py
"""

import os
import string

from tokenizers import Tokenizer, decoders, models, pre_tokenizers, processors

WORDS = (
    "the a an of to and in is on with for at by photo image picture cat dog "
    "bird horse person man woman child car train boat plane red green blue "
    "yellow black white small large two three standing sitting running "
    "walking playing eating holding wearing near under over street park "
    "beach water grass sky tree house building room table chair food ball "
    "hat shirt group young old little big"
).split()


def build():
    pieces = [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", 0.0)]
    pieces += [("▁" + w, -float(i) / 10 - 1.0) for i, w in enumerate(WORDS)]
    # character fallback so any cleaned text tokenizes without <unk>
    chars = string.ascii_lowercase + string.ascii_uppercase + string.digits + ".,!?'-"
    pieces += [(c, -12.0) for c in chars]
    pieces += [("▁" + c, -12.5) for c in chars]
    pieces.append(("▁", -11.0))

    tok = Tokenizer(models.Unigram(pieces, unk_id=2))
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    tok.decoder = decoders.Metaspace()
    tok.post_processor = processors.TemplateProcessing(
        single="$A </s>",
        pair="$A </s> $B </s>",
        special_tokens=[("</s>", 1)],
    )
    return tok


def main():
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "assets", "siglip_vocab",
    )
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "c4_en_32000.json")
    build().save(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
