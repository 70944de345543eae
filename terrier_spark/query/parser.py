"""Structured query parser.

Covers the operator surface of the reference's ANTLR grammar
(org/terrier/querying/parser/terrier.g:44-190) that the engine executes:

    term            bag-of-words scoring term
    term^2.5        per-term weight boost
    +term           required (must appear; semi-join on docids —
                    matching/tsms/RequiredTermModifier.java)
    -term           negative (must NOT appear; scored -inf then dropped in
                    the reference, querying/Manager.java:800-805,836-848 —
                    an anti-join here, same result set)
    "a b c"         exact phrase constraint (terms also score;
                    matching/dsms/PhraseScoreModifier.java:58)
    "a b"~3         proximity window constraint
    {a b c}         disjunctive group (terrier.g:196-209,
                    DisjunctiveQuery.java): matched as ONE synthetic term
                    whose postings are the OR of the alternatives with
                    summed tf and merged statistics
                    (PostingListManager.addSingleTermAlternatives:278-324)
    (a b)           explicit group (terrier.g:186-194): grouping; a
                    leading +/-/field: distributes over the members
                    (RequirementQuery / FieldQuery with an
                    ExplicitMultiTermQuery child)
    [a b]           segment (terrier.g:168-183, SegmentQuery.java): pure
                    grouping — members parse as if unbracketed
    field:term      field restriction on a field index
                    (matching/tsms/TermInFieldModifier.java semantics:
                    docs where the term occurs but NOT in that field are
                    scored -inf and dropped; docs without the term at all
                    are unaffected and score on the other terms).  On an
                    index without that field, parsing raises loudly.  For
                    in-field-only SCORING use the SingleField(<model>,
                    <fieldids>) weighting model instead
                    (matching/models/SingleFieldModel.java).

All parsed tokens run through the SAME term pipeline as indexing before
matching (Manager.java:675-679); a pipeline-dropped token drops its
modifier with it.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Tuple

_PHRASE_RE = re.compile(r'"([^"]*)"(?:~(\d+))?')
_SEGMENT_RE = re.compile(r'\[([^\[\]]*)\]')
_DISJ_RE = re.compile(r'\{([^{}]*)\}')
_GROUP_RE = re.compile(r'([+-]|\w+:)?\(([^()]*)\)')
_TOKEN_RE = re.compile(r'([+-]?)([^\s^]+)(?:\^(\d+(?:\.\d+)?))?')


@dataclass
class ParsedQuery:
    # (raw_term, weight) — scoring terms (includes phrase members)
    terms: List[Tuple[str, float]] = field(default_factory=list)
    required: List[str] = field(default_factory=list)
    negative: List[str] = field(default_factory=list)
    # (terms, window): window None -> exact phrase (consecutive)
    phrases: List[Tuple[List[str], int | None]] = field(default_factory=list)
    # (field_name, raw_term) — must appear in that field
    field_terms: List[Tuple[str, str]] = field(default_factory=list)
    # raw alternative lists — each scored as one OR-synthetic term
    disjunctions: List[List[str]] = field(default_factory=list)


def parse_query(text: str, fields: Tuple[str, ...] | None = None
                ) -> ParsedQuery:
    out = ParsedQuery()

    def eat_phrase(m: re.Match) -> str:
        words = m.group(1).split()
        window = int(m.group(2)) if m.group(2) else None
        if words:
            out.phrases.append((words, window))
            for w in words:
                out.terms.append((w, 1.0))
        return " "

    rest = _PHRASE_RE.sub(eat_phrase, text)
    # segments are pure grouping: strip the brackets, keep the members
    # (SegmentQuery adds nothing to matching; it exists for rewriters)
    rest = _SEGMENT_RE.sub(lambda m: f" {m.group(1)} ", rest)

    def eat_disj(m: re.Match) -> str:
        words = m.group(1).split()
        if len(words) == 1:
            out.terms.append((words[0], 1.0))
        elif words:
            out.disjunctions.append(words)
        return " "

    rest = _DISJ_RE.sub(eat_disj, rest)

    def eat_group(m: re.Match) -> str:
        mod, body = m.group(1) or "", m.group(2)
        # the modifier distributes over the group members
        prefix = mod if mod in ("+", "-") else ""
        fprefix = mod if mod.endswith(":") else ""
        return " " + " ".join(
            f"{prefix}{fprefix}{w}" for w in body.split()
        ) + " "

    rest = _GROUP_RE.sub(eat_group, rest)
    # every bracket construct must have been consumed by now: leftover
    # bracket/quote characters mean unbalanced or nested grouping, which
    # the reference ANTLR grammar rejects rather than mis-parses
    leftover = [c for c in rest if c in '()[]{}"']
    if leftover:
        raise ValueError(
            f"malformed query {text!r}: unbalanced or nested grouping "
            f"(leftover {''.join(leftover)!r} after parsing)"
        )
    for m in _TOKEN_RE.finditer(rest):
        prefix, tok, boost = m.group(1), m.group(2), m.group(3)
        if ":" in tok:
            fname, _, fterm = tok.partition(":")
            if not fields or fname not in fields:
                raise ValueError(
                    f"field restriction {tok!r}: field {fname!r} is not in "
                    f"this index (available: {list(fields or [])})"
                )
            out.field_terms.append((fname, fterm))
            out.terms.append((fterm, float(boost) if boost else 1.0))
            continue
        weight = float(boost) if boost else 1.0
        if prefix == "-":
            out.negative.append(tok)
        elif prefix == "+":
            out.required.append(tok)
            out.terms.append((tok, weight))
        else:
            out.terms.append((tok, weight))
    return out
