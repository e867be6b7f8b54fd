"""Byte-level BPE tokenizer for CLIP, TPU-framework edition.

This is a from-scratch implementation of the OpenAI CLIP byte-pair-encoding
scheme (the public algorithm behind the reference's
`src/open_clip/tokenizer.py:133-265`).  Token-id parity with the reference is
covered by `tests/test_tokenizer.py`.

Differences from the reference (deliberate, TPU-first):

* returns `numpy.int32` arrays (host-side) rather than torch tensors — ids are
  fed straight to `jax.device_put` / the input pipeline;
* `ftfy` is optional: when absent we fall back to NFC normalization, which is
  identical for well-formed unicode input (the reference hard-requires ftfy);
* the encoder caches per-word BPE segmentations with a plain dict (same as the
  reference) but is safe to share across threads because entries are
  write-once.

Reference behaviours reproduced exactly:
  vocab construction (`tokenizer.py:140-153`), special tokens
  `<start_of_text>`/`<end_of_text>` (`tokenizer.py:150`), clean functions
  lower/whitespace/canonicalize (`tokenizer.py:66-130`), pad-with-zeros +
  truncate-with-EOT framing (`tokenizer.py:259-265`).
"""

from __future__ import annotations

import gzip
import html
import os
import string
import unicodedata
from functools import lru_cache
from typing import Callable, List, Optional, Union

import numpy as np

try:  # optional; reference requires it (tokenizer.py:13)
    import ftfy

    _HAS_FTFY = True
except ImportError:  # pragma: no cover
    ftfy = None
    _HAS_FTFY = False

import regex as re

DEFAULT_CONTEXT_LENGTH = 77  # OpenAI CLIP context length (tokenizer.py:23)


@lru_cache()
def default_bpe() -> str:
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "assets", "bpe_simple_vocab_16e6.txt.gz"
    )


@lru_cache()
def bytes_to_unicode():
    """Map all 256 byte values to printable unicode codepoints.

    Standard GPT-2/CLIP scheme: printable latin ranges map to themselves, the
    rest are shifted past 255 so the BPE never sees whitespace/control chars.
    """
    printable = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    mapping = {b: chr(b) for b in printable}
    shift = 0
    for b in range(256):
        if b not in mapping:
            mapping[b] = chr(256 + shift)
            shift += 1
    return mapping


def basic_clean(text: str) -> str:
    if _HAS_FTFY:
        text = ftfy.fix_text(text)
    else:
        text = unicodedata.normalize("NFC", text)
    # double-unescape matches the reference (tokenizer.py:66-69)
    text = html.unescape(html.unescape(text))
    return text.strip()


def whitespace_clean(text: str) -> str:
    return " ".join(text.split()).strip()


_PUNCT_TABLE = str.maketrans("", "", string.punctuation)


def canonicalize_text(
    text: str,
    *,
    keep_punctuation_exact_string: Optional[str] = None,
    trans_punctuation: dict = _PUNCT_TABLE,
) -> str:
    """Lowercase + strip punctuation (big_vision prompt canonicalization)."""
    text = text.replace("_", " ")
    if keep_punctuation_exact_string:
        text = keep_punctuation_exact_string.join(
            part.translate(trans_punctuation)
            for part in text.split(keep_punctuation_exact_string)
        )
    else:
        text = text.translate(trans_punctuation)
    text = text.lower()
    return " ".join(text.split()).strip()


def _clean_canonicalize(x: str) -> str:
    return canonicalize_text(basic_clean(x))


def _clean_lower(x: str) -> str:
    return whitespace_clean(basic_clean(x)).lower()


def _clean_whitespace(x: str) -> str:
    return whitespace_clean(basic_clean(x))


def get_clean_fn(type: str) -> Callable[[str], str]:
    if type == "canonicalize":
        return _clean_canonicalize
    if type == "lower":
        return _clean_lower
    if type == "whitespace":
        return _clean_whitespace
    raise ValueError(f"Invalid clean function ({type}).")


class SimpleTokenizer:
    """CLIP byte-BPE tokenizer producing fixed-length int32 id arrays."""

    def __init__(
        self,
        bpe_path: Optional[str] = None,
        additional_special_tokens: Optional[List[str]] = None,
        context_length: Optional[int] = DEFAULT_CONTEXT_LENGTH,
        clean: str = "lower",
        reduction_mask: str = "",
    ):
        bpe_path = bpe_path or default_bpe()
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}

        with gzip.open(bpe_path) as f:
            lines = f.read().decode("utf-8").split("\n")
        # header line dropped; 48894 merges used (tokenizer.py:141-142)
        merge_lines = lines[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(line.split()) for line in merge_lines]

        base = list(self.byte_encoder.values())
        vocab = base + [tok + "</w>" for tok in base]
        vocab.extend("".join(m) for m in merges)
        special_tokens = ["<start_of_text>", "<end_of_text>"]
        if additional_special_tokens:
            special_tokens = special_tokens + list(additional_special_tokens)
        vocab.extend(special_tokens)

        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self._cache = {t: t for t in special_tokens}
        self._special_tokens = set(special_tokens)

        # optional native (C++) BPE core; silently falls back to Python
        self._native = None
        self._id_cache = {}
        try:
            from .native import NativeBPE

            self._native = NativeBPE(merges, vocab)
        except Exception:
            pass
        special_alt = "|".join(special_tokens)
        self.pat = re.compile(
            special_alt + r"""|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE,
        )
        self.vocab_size = len(self.encoder)
        self.all_special_ids = [self.encoder[t] for t in special_tokens]
        self.sot_token_id = self.all_special_ids[0]
        self.eot_token_id = self.all_special_ids[1]
        self.context_length = context_length
        self.clean_fn = get_clean_fn(clean)
        self.reduction_fn = (
            get_reduction_mask_fn(reduction_mask) if reduction_mask else None
        )

    # -- BPE core ----------------------------------------------------------
    def bpe(self, token: str) -> str:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        if len(word) == 1:
            return token + "</w>"

        while len(word) > 1:
            # find the lowest-rank adjacent pair
            best_rank = None
            best_pair = None
            for pair in zip(word[:-1], word[1:]):
                rank = self.bpe_ranks.get(pair)
                if rank is not None and (best_rank is None or rank < best_rank):
                    best_rank = rank
                    best_pair = pair
            if best_pair is None:
                break
            first, second = best_pair
            merged = []
            i = 0
            n = len(word)
            while i < n:
                if i < n - 1 and word[i] == first and word[i + 1] == second:
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)

        out = " ".join(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        text = self.clean_fn(text)
        if self._native is not None:
            memo = self._id_cache
            for token in re.findall(self.pat, text):
                hit = memo.get(token)
                if hit is not None:
                    ids.extend(hit)
                    continue
                if token in self._special_tokens:
                    word_ids = [self.encoder[token]]  # specials bypass BPE
                else:
                    mapped = "".join(
                        self.byte_encoder[b] for b in token.encode("utf-8")
                    )
                    word_ids = self._native.encode_word(mapped)
                memo[token] = word_ids
                ids.extend(word_ids)
            return ids
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return ids

    def decode(self, tokens) -> str:
        text = "".join(self.decoder[int(t)] for t in tokens)
        raw = bytearray(self.byte_decoder[c] for c in text)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")

    # -- batching ----------------------------------------------------------
    def __call__(
        self,
        texts: Union[str, List[str]],
        context_length: Optional[int] = None,
        rng: Optional[np.random.Generator] = None,
    ) -> np.ndarray:
        """Tokenize to a `[len(texts), context_length]` int32 array.

        Framing matches `tokenizer.py:250-265`: `<sot> ids <eot>` padded with
        zeros; over-long sequences truncated with the final slot forced to EOT.
        `rng` (random/shuffle/simple reduction masks only) pins the kept-token
        draw; without it the masks seed from the global numpy state.
        """
        if isinstance(texts, str):
            texts = [texts]
        context_length = context_length or self.context_length
        assert context_length, "Please set a valid context length"

        if self.reduction_fn is not None:
            kwargs = {"rng": rng} if rng is not None else {}
            return self.reduction_fn(
                texts,
                context_length=context_length,
                sot_token_id=self.sot_token_id,
                eot_token_id=self.eot_token_id,
                encode_fn=self.encode,
                **kwargs,
            )

        result = np.zeros((len(texts), context_length), dtype=np.int32)
        for i, text in enumerate(texts):
            tokens = [self.sot_token_id] + self.encode(text) + [self.eot_token_id]
            if len(tokens) > context_length:
                tokens = tokens[:context_length]
                tokens[-1] = self.eot_token_id
            result[i, : len(tokens)] = tokens
        return result


_tokenizer: Optional[SimpleTokenizer] = None


def _default_tokenizer() -> SimpleTokenizer:
    global _tokenizer
    if _tokenizer is None:
        _tokenizer = SimpleTokenizer()
    return _tokenizer


def tokenize(
    texts: Union[str, List[str]], context_length: int = DEFAULT_CONTEXT_LENGTH
) -> np.ndarray:
    """Module-level convenience matching `open_clip.tokenize`."""
    return _default_tokenizer()(texts, context_length=context_length)


def decode(output_ids) -> str:
    return _default_tokenizer().decode(np.asarray(output_ids))


# ---------------------------------------------------------------------------
# Token-reduction strategies (`tokenizer.py:280-400`): used to squeeze long
# texts into the context window during training.
# ---------------------------------------------------------------------------

def _reduction_rng(rng: Optional[np.random.Generator]) -> np.random.Generator:
    """Default rng for the reduction masks, seeded from the GLOBAL numpy
    state: the reference's torch.randperm respects torch.manual_seed, so the
    equivalent contract here is that np.random.seed (set by
    train.main.random_seed) makes tokenization reproducible."""
    if rng is not None:
        return rng
    return np.random.default_rng(np.random.randint(0, 2**31 - 1))


def random_mask_tokenize(
    texts: List[str],
    context_length: int,
    sot_token_id: int,
    eot_token_id: int,
    encode_fn: Callable,
    shuffle: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    rng = _reduction_rng(rng)
    result = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        tokens = np.asarray(encode_fn(text), dtype=np.int32)
        num_tokens = len(tokens)
        budget = context_length - 2  # room for sot/eot
        if num_tokens > budget:
            keep = rng.permutation(num_tokens)[:budget]
            if not shuffle:
                keep = np.sort(keep)
            tokens = tokens[keep]
            num_tokens = budget
        result[i, 0] = sot_token_id
        result[i, 1 : 1 + num_tokens] = tokens
        result[i, 1 + num_tokens] = eot_token_id
    return result


def simple_mask_tokenize(
    texts: List[str],
    context_length: int,
    sot_token_id: int,
    eot_token_id: int,
    encode_fn: Callable,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Keep a random contiguous span when the caption is over-long."""
    rng = _reduction_rng(rng)
    result = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        tokens = encode_fn(text)
        budget = context_length - 2
        if len(tokens) > budget:
            start = int(rng.integers(0, len(tokens) - budget + 1))
            tokens = tokens[start : start + budget]
        framed = [sot_token_id] + list(tokens) + [eot_token_id]
        result[i, : len(framed)] = framed
    return result


# Closed-class words for the offline POS fallback of syntax_mask_tokenize.
_FUNCTION_WORDS = frozenset(
    "a an the this that these those some any no every each either neither "
    "and or but nor so yet for of in on at by with from to into onto over "
    "under above below between among through during before after about "
    "against up down out off again further then once here there when where "
    "why how is are was were be been being am do does did doing have has "
    "had having will would shall should may might must can could i you he "
    "she it we they me him her us them my your his its our their mine yours "
    "hers ours theirs who whom whose which what not as if than too very "
    "just also only own same such both more most other another".split()
)


def _heuristic_pos_tag(words: List[str]) -> List[str]:
    """Suffix/lexicon POS approximation for environments without the nltk
    tagger data. Only the NN/JJ/VB/other distinction matters for the
    priority ordering below."""
    tags = []
    for w in words:
        lw = w.lower()
        if not lw or not lw[0].isalpha():
            tags.append("OTHER")
        elif lw in _FUNCTION_WORDS:
            tags.append("OTHER")
        elif lw.endswith("ly"):
            tags.append("RB")
        elif lw.endswith(("ing", "ed")) and len(lw) > 4:
            tags.append("VB")
        elif lw.endswith(
            ("ous", "ful", "ive", "able", "ible", "al", "ish", "less", "est", "ier")
        ):
            tags.append("JJ")
        else:
            tags.append("NN")
    return tags


def syntax_mask_tokenize(
    texts: List[str],
    context_length: int,
    sot_token_id: int,
    eot_token_id: int,
    encode_fn: Callable,
) -> np.ndarray:
    """POS-priority token reduction (`tokenizer.py:331-387`): when a caption
    is over-long, keep words ranked nouns(1) < adjectives(2) < verbs(3) <
    everything else(4), preserving original word order among the survivors.

    Uses nltk's word tokenizer + perceptron tagger when its data is
    installed (exact reference behaviour); otherwise falls back to a
    regex word split + heuristic tagger with the same priority scheme
    (this environment has no nltk corpora and no egress — documented
    divergence, same selection contract).
    """
    import re

    def _order(tag: str) -> int:
        if tag.startswith("NN"):
            return 1
        if tag.startswith("JJ"):
            return 2
        if tag.startswith("VB"):
            return 3
        return 4

    def _tag(text: str):
        try:
            import nltk

            words = nltk.tokenize.word_tokenize(text)
            return words, [t for _, t in nltk.pos_tag(words)]
        except (ImportError, LookupError):
            words = re.findall(r"\w+|[^\w\s]", text)
            return words, _heuristic_pos_tag(words)

    new_texts = []
    for text in texts:
        words, tags = _tag(text)
        order = np.asarray([_order(t) for t in tags])
        keep = np.sort(np.argsort(order, kind="stable")[: context_length - 2])
        new_texts.append(" ".join(str(words[j]) for j in keep).strip())

    result = np.zeros((len(new_texts), context_length), dtype=np.int32)
    for i, text in enumerate(new_texts):
        tokens = [sot_token_id] + list(encode_fn(text)) + [eot_token_id]
        if len(tokens) > context_length:  # multi-token words can overflow
            tokens = tokens[:context_length]
            tokens[-1] = eot_token_id
        result[i, : len(tokens)] = tokens
    return result


def get_reduction_mask_fn(type: str) -> Callable:
    if type == "simple":
        return simple_mask_tokenize
    if type == "random":
        return random_mask_tokenize
    if type == "shuffle":
        import functools

        return functools.partial(random_mask_tokenize, shuffle=True)
    if type == "syntax":
        return syntax_mask_tokenize
    raise ValueError(f"Unsupported reduction mask type: {type!r}")


# ---------------------------------------------------------------------------
# HF / SentencePiece wrappers (`tokenizer.py:403-528`) — thin adapters that
# keep the same calling convention but emit numpy.
# ---------------------------------------------------------------------------

class HFTokenizer:
    """HuggingFace AutoTokenizer wrapper with CLIP-style framing."""

    def __init__(
        self,
        tokenizer_name: str,
        context_length: Optional[int] = DEFAULT_CONTEXT_LENGTH,
        clean: str = "whitespace",
        strip_sep_token: bool = False,
        language: Optional[str] = None,
        cache_dir: Optional[str] = None,
        **kwargs,
    ):
        from transformers import AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(
            tokenizer_name, cache_dir=cache_dir, **kwargs
        )
        set_lang_fn = getattr(self.tokenizer, "set_src_lang_special_tokens", None)
        if callable(set_lang_fn):
            self.set_lang_fn = set_lang_fn
        if language is not None:
            self.set_language(language)
        self.context_length = context_length
        self.clean_fn = get_clean_fn(clean)
        self.strip_sep_token = strip_sep_token

    def save_pretrained(self, dest):
        self.tokenizer.save_pretrained(dest)

    def __call__(self, texts, context_length: Optional[int] = None) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        context_length = context_length or self.context_length
        assert context_length, "Please set a valid context length in class init or call."

        texts = [self.clean_fn(t) for t in texts]
        input_ids = self.tokenizer.batch_encode_plus(
            texts,
            return_tensors="np",
            max_length=context_length,
            padding="max_length",
            truncation=True,
        ).input_ids
        if self.strip_sep_token:
            input_ids = np.where(
                input_ids == self.tokenizer.sep_token_id, 0, input_ids
            )
        return input_ids.astype(np.int32)

    def set_language(self, src_lang):
        if hasattr(self, "set_lang_fn"):
            self.set_lang_fn(src_lang)
        else:
            import warnings

            warnings.warn("Cannot set language for the tokenizer.")


class SigLipTokenizer:
    """SentencePiece tokenizer wrapper for SigLIP models (T5/mT5/Gemma vocabs,
    reference `tokenizer.py:464-528`).

    The reference auto-downloads the vocab from GCS on every construction;
    this rebuild is offline-first and resolves `tokenizer_name` through a
    documented chain instead:

    1. An existing local path — a sentencepiece ``.model`` (needs the
       `sentencepiece` package), a serialized fast-tokenizer ``.json``, or a
       `save_pretrained` directory.
    2. A logical vocab name (``c4-en`` / ``mc4`` / ``gemma``) or a SigLIP
       model name (``ViT-B-16-SigLIP`` → ``c4-en``, ``*-i18n`` → ``mc4``,
       ``*SigLIP2*`` → ``gemma``), looked up as a file named
       ``VOCAB_FILES[name]`` (or its ``.json`` sibling) in
       ``$REFINING_CLIP_VOCAB_DIR``.
    3. The local HuggingFace cache (no network): the same vocabs ship with
       public HF models — ``c4-en`` is byte-identical to `t5-base`'s
       cc_en.32000 spiece model, ``mc4`` to `google/mt5-base`'s, ``gemma``
       to `google/gemma-2b`'s tokenizer.

    Gemma vocabs load through `GemmaTokenizerFast` (right-padding, EOS
    appended, pad id 0) exactly as the reference does; everything else
    through `T5TokenizerFast` (pad id forced to 1, the SigLIP convention).
    """

    VOCAB_FILES = {
        # english, vocab_size=32000 (reference: t5-data cc_en.32000)
        "c4-en": "c4_en_32000.model",
        # multilingual (mT5, PaLI), vocab_size=250000
        "mc4": "mc4_250000.model",
        # SigLIP2, vocab_size=256000 (big_vision gemma tokenizer)
        "gemma": "gemma_256000.model",
    }
    # logical name -> public HF repo carrying the identical vocab (cache-only
    # fallback; never triggers a download)
    HF_CACHE_EQUIVALENTS = {
        "c4-en": "t5-base",
        "mc4": "google/mt5-base",
        "gemma": "google/gemma-2b",
    }

    @classmethod
    def _logical_name(cls, tokenizer_name: str) -> Optional[str]:
        if tokenizer_name in cls.VOCAB_FILES:
            return tokenizer_name
        lname = tokenizer_name.lower()
        if "siglip" in lname:  # model name (factory.py:124-184 dispatch rule)
            if "siglip2" in lname or "gemma" in lname:
                return "gemma"
            return "mc4" if "i18n" in lname else "c4-en"
        return None

    def _build(self, gemma: bool, **load_kwargs):
        if gemma:
            from transformers import GemmaTokenizerFast

            tok = GemmaTokenizerFast(
                padding_side="right", add_bos_token=False, add_eos_token=True,
                legacy=False, **load_kwargs,
            )
            tok.pad_token_id = 0
        else:
            from transformers import T5TokenizerFast

            tok = T5TokenizerFast(extra_ids=0, legacy=False, **load_kwargs)
            tok.pad_token_id = 1
        tok.eos_token_id = 1
        return tok

    def __init__(self, tokenizer_name: str, context_length: Optional[int] = 64):
        # an existing path wins over name-based dispatch: a path like
        # "vocabs/siglip/foo.model" must never be re-routed as a logical name
        logical = None if os.path.exists(tokenizer_name) else self._logical_name(
            tokenizer_name
        )
        # gemma-convention dispatch: for a local path, only the FILE NAME
        # decides ("/data/gemma_exp/c4_en.model" is a T5-framing vocab that
        # merely lives under a gemma-named directory); for names, the
        # resolved logical name or the model name decides
        gemma_probe = (
            os.path.basename(tokenizer_name.rstrip("/"))
            if os.path.exists(tokenizer_name) else (logical or tokenizer_name)
        )
        gemma = "gemma" in gemma_probe.lower()

        # 1. explicit local artifact
        if os.path.exists(tokenizer_name):
            if os.path.isdir(tokenizer_name):
                from transformers import AutoTokenizer

                self.tokenizer = AutoTokenizer.from_pretrained(tokenizer_name)
                self.tokenizer.pad_token_id = 0 if gemma else 1
                self.tokenizer.eos_token_id = 1
            elif tokenizer_name.endswith(".json"):
                self.tokenizer = self._build(gemma, tokenizer_file=tokenizer_name)
            else:
                self.tokenizer = self._build(gemma, vocab_file=tokenizer_name)
            self.context_length = context_length
            return

        if logical is None:
            raise FileNotFoundError(
                f"SigLIP tokenizer '{tokenizer_name}' is neither an existing "
                "local path nor a known logical vocab name "
                f"({sorted(self.VOCAB_FILES)}) or SigLIP model name."
            )

        # 2. $REFINING_CLIP_VOCAB_DIR/<vocab file> (.model or .json sibling)
        vocab_dir = os.environ.get("REFINING_CLIP_VOCAB_DIR", "")
        if vocab_dir:
            base = os.path.join(vocab_dir, self.VOCAB_FILES[logical])
            for cand in (base, os.path.splitext(base)[0] + ".json"):
                if os.path.exists(cand):
                    self.tokenizer = self._build(
                        gemma,
                        **(
                            {"tokenizer_file": cand}
                            if cand.endswith(".json")
                            else {"vocab_file": cand}
                        ),
                    )
                    self.context_length = context_length
                    return

        # 3. local HF cache of a public model with the identical vocab.
        # $REFINING_CLIP_HF_CACHE overrides the cache location at CALL time
        # (transformers bakes TRANSFORMERS_CACHE/HF_HOME into constants at
        # import, so env changes after import don't reach from_pretrained —
        # tests point this at an empty dir to make negative cases hermetic).
        try:
            from transformers import AutoTokenizer

            cache_override = os.environ.get("REFINING_CLIP_HF_CACHE") or None
            tok = AutoTokenizer.from_pretrained(
                self.HF_CACHE_EQUIVALENTS[logical], local_files_only=True,
                cache_dir=cache_override,
            )
            tok.pad_token_id = 0 if gemma else 1
            tok.eos_token_id = 1
            self.tokenizer = tok
            self.context_length = context_length
            return
        except Exception:
            pass

        raise FileNotFoundError(
            f"SigLIP vocab '{logical}' not found offline. Options: "
            f"(a) pass a local sentencepiece .model / fast-tokenizer .json "
            f"path directly; (b) place {self.VOCAB_FILES[logical]!r} (or its "
            f".json sibling) in $REFINING_CLIP_VOCAB_DIR; (c) populate the "
            f"HF cache with {self.HF_CACHE_EQUIVALENTS[logical]!r} (same "
            f"vocab) on a connected machine; (d) use a config with "
            f"text_cfg.hf_tokenizer_name (HFTokenizer path)."
        )

    def save_pretrained(self, dest):
        self.tokenizer.save_pretrained(dest)

    def __call__(self, texts, context_length: Optional[int] = None) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        context_length = context_length or self.context_length
        assert context_length, "Please set a valid context length in class init or call."

        texts = [canonicalize_text(basic_clean(t)) for t in texts]
        output = self.tokenizer(
            texts,
            return_tensors="np",
            max_length=context_length,
            padding="max_length",
            truncation=True,
        )
        return output.input_ids.astype(np.int32)
