# -*- coding: utf-8 -*-
"""F4: structured Hungarian-address parser — grammar-data driven.

The reference parses addresses with a waxeye-generated PEG automaton
(``libs/hu/hu_address_parser.py`` — generated tables produced by the
public waxeye generator from a grammar file the reference does NOT
ship), the waxeye runtime (``libs/waxeye.py``), the AST flattener
``libs/waxeye_process.py:15-50``, and the wrapper
``extract_all_address_waxeye`` (``libs/address.py:315-356``) which
consumes only the keys {postcode, cTown, cStreet, type, houseNumber,
subLetter, conscriptionHrsz}.

The automaton tables ARE the grammar — byte-level behavioral parity is
impossible without that data, exactly like the street-type vocabulary
tables carried in ``hu_address.py`` (adjudicated unavoidable data
parity). The tables are therefore extracted MECHANICALLY into the JSON
resource ``resources/hu_address_grammar.json`` (see
``tools/extract_hu_grammar.py``), and this module interprets them with
a from-scratch engine: all executable logic here is new — a different
walker design (iterative edge loop, sentinel-based failure, plain-dict
memo, no line/column machinery) — only the grammar data is recovered.

Pinned behavioral quirks (validated by ``tools/peg_parity_sweep.py``
against the real reference parser over a combinatorial corpus plus the
55-case golden table in ``tests/fixtures/waxeye_goldens.json``):

- a failed parse flattens to an EMPTY dict, so the wrapper returns
  all-None (the reference's ParseError is not an Exception subclass;
  the fallback path in address.py:346-352 fires only when the parse
  itself raises, e.g. RecursionError on pathological inputs);
- the flattener returns None when a top-level AST child is a bare
  character (AttributeError swallowed, waxeye_process:45-50) — e.g.
  a PRUNE-collapsed single-nonterminal parse like a lone city name;
- all-caps town/street parse into uTown/uStreet, which the wrapper
  ignores — postcode and housenumber still come through;
- only ``conscriptionHrsz`` ('1234/5 hrsz[.]') is surfaced; the
  reversed forms ('hrsz 1234/5', 'Hrsz.: 123') parse into
  conscriptionRev/conscriptionNum and are DROPPED by the wrapper;
- the street-type token is preserved verbatim and only the exact
  lowercase 'u.' substring is expanded to 'utca' (address.py:337-338).
"""

from __future__ import annotations

import json
import os

from .hu_address import clean_string, extract_all_address

_GRAMMAR_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources",
    "hu_address_grammar.json",
)

_FAIL = object()  # parse-failure sentinel (distinct from [] = empty success)

_MODE_VOID, _MODE_PRUNE, _MODE_LEFT, _MODE_POS, _MODE_NEG = range(5)
_MODE_OF = {"void": _MODE_VOID, "prune": _MODE_PRUNE, "left": _MODE_LEFT,
            "pos": _MODE_POS, "neg": _MODE_NEG}


class _Node:
    __slots__ = ("name", "kids")

    def __init__(self, name, kids):
        self.name = name
        self.kids = kids

    def __repr__(self):  # debugging aid only
        return f"<{self.name}:{self.kids!r}>"


def _compile(path: str = _GRAMMAR_PATH):
    """Load the grammar resource into tuple tables the walker consumes."""
    with open(path, encoding="utf-8") as f:
        g = json.load(f)
    automata = []
    for fa in g["automata"]:
        states = []
        for st in fa["states"]:
            edges = []
            for trans, target, voided in st["edges"]:
                if trans == -1:
                    kind = ("any",)
                elif isinstance(trans, str):
                    kind = ("chr", trans)
                elif "nt" in trans:
                    kind = ("sub", trans["nt"])
                else:
                    kind = (
                        "cls",
                        frozenset(trans["set"]),
                        tuple((lo, hi) for lo, hi in trans["ranges"]),
                    )
                edges.append((kind, target, voided))
            states.append((tuple(edges), st["match"]))
        automata.append((fa["name"], _MODE_OF[fa["mode"]], tuple(states)))
    return g["start"], bool(g.get("eof_check", True)), tuple(automata)


_START, _EOF_CHECK, _AUTOMATA = _compile()


def _parse(text: str):
    """Run the grammar over ``text`` → root (_Node | str | True) or _FAIL.

    Matches the reference runtime's observable semantics: ordered-edge
    backtracking over each automaton's state graph, (automaton, pos)
    memoization, PRUNE collapsing, VOID erasure, POS/NEG lookahead, and
    the whole-input check.
    """
    n = len(text)
    memo: dict = {}

    def run_automaton(idx: int, pos: int):
        key = (idx, pos)
        hit = memo.get(key)
        if hit is not None:
            return hit
        name, mode, states = _AUTOMATA[idx]
        res = run_state(states, 0, pos)
        if mode == _MODE_POS:
            out = (True, pos) if res is not _FAIL else (_FAIL, pos)
        elif mode == _MODE_NEG:
            out = (_FAIL, pos) if res is not _FAIL else (True, pos)
        elif res is _FAIL:
            out = (_FAIL, pos)
        else:
            kids, end = res
            if mode == _MODE_VOID:
                out = (True, end)
            elif mode == _MODE_PRUNE:
                if not kids:
                    out = (True, end)
                elif len(kids) == 1:
                    out = (kids[0], end)
                else:
                    out = (_Node(name, kids), end)
            else:  # LEFT
                out = (_Node(name, kids), end)
        memo[key] = out
        return out

    def run_state(states, si: int, pos: int):
        edges, is_match = states[si]
        for kind, target, voided in edges:
            k0 = kind[0]
            if k0 == "sub":
                val, end = run_automaton(kind[1], pos)
                if val is _FAIL:
                    continue
            elif pos < n:
                ch = text[pos]
                if k0 == "chr":
                    if ch != kind[1]:
                        continue
                elif k0 == "cls":
                    o = ord(ch)
                    if ch not in kind[1] and not any(
                        lo <= o <= hi for lo, hi in kind[2]
                    ):
                        continue
                # "any" always consumes
                val, end = ch, pos + 1
            else:
                continue
            rest = run_state(states, target, end)
            if rest is _FAIL:
                continue
            kids, rend = rest
            if voided or val is True:
                return (kids, rend)
            return ([val] + kids, rend)
        return ([], pos) if is_match else _FAIL

    val, end = run_automaton(_START, 0)
    if val is _FAIL or (_EOF_CHECK and end < n):
        return _FAIL
    return val


def _flatten(root):
    """The AST → key dict flattening, waxeye_process:15-50 parity.

    Branch-for-branch equivalent including the quirks: a failed parse
    (no children to walk) → {}; a bare-string top-level child → None
    (their AttributeError path); a nested flatten failure → None
    (their ``dict.update(None)`` TypeError path); nodes whose first
    child is itself a node recurse, others join their character
    children under the node name, surfacing single-level sub-nodes
    under their own names; empty-kid nodes are skipped (IndexError
    path).
    """
    if not isinstance(root, _Node):
        return {}
    out: dict = {}
    for kid in root.kids:
        if not isinstance(kid, _Node):
            return None  # their processed[str.type] AttributeError
        if not kid.kids:
            continue  # their children[0] IndexError → continue
        if isinstance(kid.kids[0], _Node):
            sub = _flatten(kid)
            if sub is None:
                return None  # their update(None) TypeError
            out.update(sub)
        else:
            text = ""
            for c in kid.kids:
                if isinstance(c, str):
                    text += c
                else:
                    if not all(isinstance(x, str) for x in c.kids):
                        return None  # their ''.join TypeError
                    out[c.name] = "".join(c.kids)
            out[kid.name] = text
    return out


_NONES = (None, None, None, None, None)


def parse_hu_address(value):
    """Structured parse → (postcode, city, street, housenumber, csn).

    Field mapping and quirks of ``extract_all_address_waxeye``
    (address.py:315-356): subLetter joins the housenumber with '/',
    the verbatim type token has only its exact 'u.' substring expanded
    to 'utca', conscription comes solely from conscriptionHrsz, and a
    raising parse falls back to extract_all_address.
    """
    postcode = city = street = housenumber = csn = None
    cleaned = clean_string(value)
    if cleaned is not None and cleaned != "":
        try:
            d = _flatten(_parse(cleaned))
            if d is not None:
                postcode = d.get("postcode")
                city = d.get("cTown")
                hn = d.get("houseNumber")
                sub = d.get("subLetter")
                if hn is not None and sub is not None:
                    housenumber = f"{hn}/{sub}"
                elif hn is not None:
                    housenumber = f"{hn}"
                sname = d.get("cStreet")
                stype = d.get("type")
                if stype is not None:
                    stype = stype.replace("u.", "utca")
                if sname is not None and stype is not None:
                    street = f"{sname} {stype}"
                elif sname is not None:
                    street = f"{sname}"
                csn = d.get("conscriptionHrsz")
                return postcode, city, street, housenumber, csn
        except Exception:
            try:
                (postcode, city, street, housenumber, csn) = (
                    extract_all_address(cleaned)
                )
            except Exception:
                pass
        return postcode, city, street, housenumber, csn
    return _NONES


# API-parity alias: the reference exposes this under the waxeye name.
extract_all_address_waxeye = parse_hu_address
