"""WordPiece detokenization + BIO co-occurrence extraction (reference M10/
M11, ``entity_parser.py:4-53``) — the decode path between a token-
classification model's (token, label) stream and entity strings.

Reference semantics preserved exactly:
  * ``detokenize``: a token whose label contains ``'X'`` is a WordPiece
    continuation — its first two characters (the ``##`` marker) are
    stripped and the remainder appends to the previous word; output is
    (label, word) pairs for the surviving words (``entity_parser.py:4-16``);
  * ``extract_entities``: a BIO walk — ``B`` starts an entity, ``I``
    continues it with a space, ``O`` closes it, applying the reference's
    separator fixes (``' - '``->``'-'``, ``' , '``->``','``) to the
    finished entity; the reassembled text applies the reference's full
    punctuation fix table; ``has_co_occurrence`` is true when >= 2
    entities survive (``entity_parser.py:19-53`` — the seed of the KG
    co-occurrence predicate).

These are row-local functions: inside a Ray pipeline they run per sentence
in a ``map_batches`` NER decode stage (stages.model_ner) — no shuffle.
"""

from __future__ import annotations

_ENTITY_FIXES = ((" - ", "-"), (" , ", ","))

_TEXT_FIXES = (
    (" .", "."), (" ,", ","), (" - ", "-"), ("( ", "("), (" )", ")"),
    (" :", ":"), (" ;", ";"), (" !", "!"), (" ?", "?"),
)


def detokenize(token_label_pairs: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """(token, label) WordPiece stream -> (label, word) pairs with ``X``
    continuations merged into the preceding word."""
    labels: list[str] = []
    words: list[str] = []
    for token, label in token_label_pairs:
        if "X" not in label:
            words.append(token)
            labels.append(label)
        elif words:
            words[-1] = words[-1] + token[2:]
    return list(zip(labels, words))


def extract_entities(label_word_pairs: list[tuple[str, str]]) -> dict:
    """BIO walk over (label, word) pairs -> entities + reassembled text +
    the co-occurrence predicate."""
    entities: list[str] = []
    entity = ""
    in_entity = False
    for label, word in label_word_pairs:
        if "B" in label:
            entity = entity + word
            in_entity = True
        elif in_entity:
            if "I" in label:
                entity = entity + " " + word
            elif "O" in label:
                in_entity = False
                for old, new in _ENTITY_FIXES:
                    entity = entity.replace(old, new)
                entities.append(entity)
                entity = ""
    # NOTE: an entity still open at sequence end is DROPPED — mirroring the
    # reference exactly (its walk only closes an entity on an 'O' label)

    text = " ".join(w for _, w in label_word_pairs)
    for old, new in _TEXT_FIXES:
        text = text.replace(old, new)
    return {
        "has_co_occurrence": len(entities) >= 2,
        "entities": entities,
        "text": text,
    }


def wordpiece_tokenize(text: str, vocab: dict[str, int],
                       unk_token: str = "[UNK]",
                       max_chars_per_word: int = 100) -> list[str]:
    """Greedy longest-match WordPiece over a whitespace+punctuation
    pre-split (the published WordPiece algorithm the reference's
    BertTokenizer implements): each word splits into the longest vocab
    piece, continuations prefixed ``##``; an unsplittable word becomes
    ``[UNK]``. Lowercases (uncased-model convention, matching the
    reference's BioBERT vocab usage)."""
    import re as _re

    out: list[str] = []
    for word in _re.findall(r"\w+|[^\w\s]", text.lower()):
        if len(word) > max_chars_per_word:
            out.append(unk_token)
            continue
        start = 0
        pieces: list[str] = []
        ok = True
        while start < len(word):
            end = len(word)
            piece = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in vocab:
                    piece = sub
                    break
                end -= 1
            if piece is None:
                ok = False
                break
            pieces.append(piece)
            start = end
        out.extend(pieces if ok else [unk_token])
    return out
