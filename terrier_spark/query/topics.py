"""TREC tagged-topic file parsing — the TRECQuery surface
(org/terrier/applications/batchquerying/TRECQuery.java:101-178).

Topic files are SGML-ish: `<top>` blocks whose tags are often UNCLOSED
(classic TREC: a tag's content runs until the next tag opens).
Reference semantics replicated:

* doctag TOP, idtag NUM, processed tags TITLE (TagSet defaults written
  by TRECSetup.java:183-186: `TrecQueryTags.process=TOP,NUM,TITLE`,
  `TrecQueryTags.skip=DESC,NARR`), all case-insensitive;
* the literal token `Number:` inside <num> is dropped and the LAST
  remaining whitespace token becomes the query id
  (TRECQuery.java:130-138);
* when desc/narr ARE requested, a leading `Description`/`Narrative`
  token is dropped (TRECQuery.java:146-155,
  trecquery.ignore.desc.narr.name.tokens=true);
* topics with an empty query text are skipped; a <top> without an id
  is an error (TRECQuery.java:162-166).
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple

_TAG_RE = re.compile(r"<\s*(/?)([A-Za-z][\w-]*)\s*>")


def _tag_texts(block: str) -> dict:
    """tag name (lower) -> concatenated text content.  A tag's content
    ends where the next tag opens (unclosed-tag TREC convention) or at
    its explicit close tag."""
    out: dict[str, list] = {}
    current = None
    pos = 0
    for m in _TAG_RE.finditer(block):
        if current is not None:
            out.setdefault(current, []).append(block[pos:m.start()])
        closing, name = m.group(1), m.group(2).lower()
        current = None if closing else name
        pos = m.end()
    if current is not None:
        out.setdefault(current, []).append(block[pos:])
    return {k: " ".join(v) for k, v in out.items()}


def parse_trec_topics(
    text: str,
    fields: Sequence[str] = ("title",),
    id_tag: str = "num",
) -> List[Tuple[str, str]]:
    """Parse a TREC topics file's text -> [(qid, query text)] in file
    order.  `fields` selects the tags whose text forms the query
    (default title-only, the reference's processed-tag default)."""
    topics = []
    # split into <top> ... blocks; the closing </top> is optional
    parts = re.split(r"<\s*top\s*>", text, flags=re.IGNORECASE)
    for block in parts[1:]:
        block = re.split(r"<\s*/\s*top\s*>", block, flags=re.IGNORECASE)[0]
        tags = _tag_texts(block)
        raw_id = tags.get(id_tag.lower(), "")
        qid = None
        for tok in raw_id.split():
            if tok.rstrip(":").lower() != "number":
                qid = tok
        if qid is None:
            raise ValueError(
                f"topic block has no id in <{id_tag}>: {block[:80]!r}"
            )
        words: list = []
        for f in fields:
            toks = tags.get(f.lower(), "").split()
            # drop the leading field-name token the reference ignores
            # (e.g. "<desc> Description: ...")
            if toks and f.lower() in ("desc", "narr") and (
                toks[0].rstrip(":").lower()
                in ("description", "narrative")
            ):
                toks = toks[1:]
            words.extend(toks)
        query = " ".join(words).strip()
        if not query:
            continue  # TRECQuery.java:161-162
        topics.append((qid, query))
    return topics


def load_trec_topics(path: str,
                     fields: Sequence[str] = ("title",),
                     encoding: str = "utf-8") -> List[Tuple[str, str]]:
    with open(path, encoding=encoding, errors="replace") as fh:
        return parse_trec_topics(fh.read(), fields=fields)


def load_single_line_topics(path: str) -> List[Tuple[str, str]]:
    """SingleLineTRECQuery format: `qid term term ...` per line
    (applications/batchquerying/SingleLineTRECQuery.java:93-156)."""
    out = []
    with open(path) as fh:
        for line in fh:
            parts = line.strip().split(None, 1)
            if len(parts) == 2:
                out.append((parts[0], parts[1]))
    return out
