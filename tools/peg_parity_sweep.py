"""Brute-force parity sweep: our PEG wrapper vs the reference parser.

Runs the reference's real waxeye-generated Hungarian address parser
(``libs/hu/hu_address_parser.py`` + runtime ``libs/waxeye.py`` + AST
flattener ``libs/waxeye_process.py``) wrapped by the exact
``extract_all_address_waxeye`` logic (``libs/address.py:315-356``,
re-typed below against the real reference clean_string/fallback), over
a large deterministic generated corpus of Hungarian address strings
spanning the grammar — postcode/city casing, street-type vocabulary,
housenumber forms, districts, hrsz variants, corner/multi-street
shapes — and diffs the 5-tuples against
``osm_poi_matchmaker_spark.functions.hu_address_peg.parse_hu_address``.

Usage: python3 tools/peg_parity_sweep.py [N_per_template_cap]
Writes a mismatch report to /tmp/peg_parity_report.json and prints a
summary. Exit code 0 iff no mismatches.
"""

from __future__ import annotations

import importlib.util
import itertools
import json
import os
import sys
import types as pytypes

REF = "/root/reference/osm_poi_matchmaker"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_reference():
    """Load waxeye runtime + parser + flattener + the address module's
    clean_string/extract_all_address, with package imports satisfied."""
    pkg = pytypes.ModuleType("osm_poi_matchmaker")
    pkg.__path__ = [REF]
    sys.modules["osm_poi_matchmaker"] = pkg
    libs = pytypes.ModuleType("osm_poi_matchmaker.libs")
    libs.__path__ = [os.path.join(REF, "libs")]
    sys.modules["osm_poi_matchmaker.libs"] = libs
    hu = pytypes.ModuleType("osm_poi_matchmaker.libs.hu")
    hu.__path__ = [os.path.join(REF, "libs", "hu")]
    sys.modules["osm_poi_matchmaker.libs.hu"] = hu

    def load(name, relpath):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(REF, relpath)
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("osm_poi_matchmaker.libs.waxeye", "libs/waxeye.py")
    parser_mod = load(
        "osm_poi_matchmaker.libs.hu.hu_address_parser",
        "libs/hu/hu_address_parser.py",
    )
    wp = load("osm_poi_matchmaker.libs.waxeye_process", "libs/waxeye_process.py")
    return parser_mod, wp


def _ref_wrapper(parser_mod, wp, clean_string, extract_all_address):
    """The extract_all_address_waxeye logic, address.py:315-356."""

    def fn(clearable):
        postcode = city = street = housenumber = csn = None
        clearable = clean_string(clearable)
        if clearable is not None and clearable != "":
            try:
                parsed = parser_mod.Parser().parse(clearable)
                d = wp.waxeye_process(parsed)
                if d is not None:
                    postcode = d.get("postcode")
                    city = d.get("cTown")
                    hn_only = d.get("houseNumber")
                    sub = d.get("subLetter")
                    if hn_only is not None and sub is not None:
                        housenumber = f"{hn_only}/{sub}"
                    elif hn_only is not None:
                        housenumber = f"{hn_only}"
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
                        extract_all_address(clearable)
                    )
                except Exception:
                    pass
            return postcode, city, street, housenumber, csn
        return None, None, None, None, None

    return fn


def gen_corpus(cap: int | None = None) -> list[str]:
    """Deterministic combinatorial HU-address corpus (~30k strings)."""
    pre = ["1066 ", "9021. ", "6722, ", "", "106 ", "10660 "]
    cities = [
        "Budapest", "Győr", "Szeged", "BUDAPEST", "budapest",
        "Hódmezővásárhely", "Balatonfüred", "",
    ]
    seps = [", ", " ", ",", ""]
    streets = [
        "Teréz körút", "Vak Bottyán utca", "Fő tér", "Király u.",
        "Váci Út", "Nagy Lajos király útja", "Szent István krt.",
        "Hűvösvölgyi sétány", "Kossuth Lajos Utca", "Árpád fejedelem útja",
        "Petőfi Sándor", "Rákóczi", "Corvin sétány 1. lépcsőház",
        "Bajcsy-Zsilinszky út", "Alsó kikötő sor", "Ipartelep",
        "V. kerület Deák tér", "II. Rákóczi Ferenc út",
        "Tisza Lajos körút", "Külső-Szegedi út",
    ]
    hns = [
        "36", "36.", "12/B", "12/b", "12.b", "12-14", "12-14/A", "3",
        "1/a.", "115/a", "7. a", "", "221/A. fsz. 2.", "5. I. em. 3.",
        "hrsz 1234/5", "1234/5 hrsz", "1234/5 HRSZ.", "Hrsz.: 123",
        "0133/29 hrsz.", "sarok", "36 (bejárat az udvarból)",
    ]
    out = []
    for p, c, sep, st, hn in itertools.product(pre, cities, seps, streets, hns):
        s = f"{p}{c}{sep}{st} {hn}".strip()
        if s:
            out.append(s)
    extra = [
        "Budapest", "1066", "1066 Budapest", "1066 Budapest, V. kerület",
        "Duna Pláza", "1066 Budapest, Teréz körút 36. és Andrássy út 2.",
        "Teréz körút 36., 1066 Budapest", "1066-Budapest-Teréz körút 36",
        "1066 Budapest; Teréz körút 36", "  1066   Budapest ,  Teréz körút 36 ",
        "9700 Szombathely, Fő tér 1. (a városháza mellett)",
        "H-1066 Budapest, Teréz körút 36.",
        "1066 Budapest Teréz körút 36-38. B. ép.",
    ]
    out.extend(extra)
    # dedupe, keep deterministic order
    seen, dedup = set(), []
    for s in out:
        if s not in seen:
            seen.add(s)
            dedup.append(s)
    return dedup[:cap] if cap else dedup


def gen_fuzz(n: int, seed: int = 20260819) -> list[str]:
    """Deterministic char-level fuzz: template corpus samples mutated by
    random edits (delete/insert/replace/case-flip/splice) over an
    alphabet covering the grammar's terminals — digits, accents, caps,
    separators, the hrsz/em./fsz./lph. keywords' characters."""
    import random

    rng = random.Random(seed)
    base = gen_corpus()
    alphabet = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "áéíóöőúüűÁÉÍÓÖŐÚÜŰ0123456789 .,:/-()'\"\t;"
    )
    words = ["hrsz", "em.", "fsz.", "lph.", "ép.", "ajtó", "szám", "km",
             "kerület", "I.", "IV", "1/2", "tetőtér", "pince", "mfszt"]
    out = []
    for _ in range(n):
        s = rng.choice(base)
        for _ in range(rng.randint(1, 4)):
            op = rng.randrange(5)
            if not s:
                s = rng.choice(base)
            i = rng.randrange(max(1, len(s)))
            if op == 0:
                s = s[:i] + s[i + 1:]
            elif op == 1:
                s = s[:i] + rng.choice(alphabet) + s[i:]
            elif op == 2:
                s = s[:i] + rng.choice(alphabet) + s[i + 1:]
            elif op == 3:
                s = s[:i] + s[i:i + 1].swapcase() + s[i + 1:]
            else:
                s = s[:i] + " " + rng.choice(words) + " " + s[i:]
        out.append(s)
    return out


def main() -> int:
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else None
    parser_mod, wp = _load_reference()

    # the reference wrapper's clean_string + fallback come from the
    # repo's parity-pinned re-implementations (goldens-tested)
    from osm_poi_matchmaker_spark.functions.hu_address import (
        clean_string,
        extract_all_address,
    )
    from osm_poi_matchmaker_spark.functions.hu_address_peg import (
        parse_hu_address,
    )

    ref = _ref_wrapper(parser_mod, wp, clean_string, extract_all_address)
    if len(sys.argv) > 2 and sys.argv[2] == "fuzz":
        corpus = gen_fuzz(cap or 100000)
    else:
        corpus = gen_corpus(cap)
    mismatches = []
    for s in corpus:
        want = ref(s)
        got = parse_hu_address(s)
        if tuple(want) != tuple(got):
            mismatches.append({"input": s, "ref": want, "ours": got})
    report = {
        "corpus": len(corpus),
        "mismatches": len(mismatches),
        "rate": round(len(mismatches) / max(1, len(corpus)), 4),
        "cases": mismatches[:500],
    }
    with open("/tmp/peg_parity_report.json", "w", encoding="utf-8") as f:
        json.dump(report, f, ensure_ascii=False, indent=1)
    print(f"corpus={len(corpus)} mismatches={len(mismatches)} "
          f"rate={report['rate']}")
    return 0 if not mismatches else 1


if __name__ == "__main__":
    sys.exit(main())
