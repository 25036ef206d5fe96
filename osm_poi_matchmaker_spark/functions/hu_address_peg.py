"""F4: structured Hungarian-address parser — from scratch.

The reference parses addresses with a waxeye-generated PEG automaton
(``libs/hu/hu_address_parser.py`` [generated, 1.4 kLoC DFA tables],
runtime ``libs/waxeye.py``, AST flattener ``libs/waxeye_process.py:15-50``)
wrapped by ``extract_all_address_waxeye`` (``libs/address.py:315-356``)
which consumes only the keys {postcode, cTown, cStreet, type, houseNumber,
subLetter, conscriptionHrsz} and flattens them to a 5-tuple
``(postcode, city, street, housenumber, conscriptionnumber)``.

Copying the generated DFA would violate the no-copy rule, so this module
re-implements the *wrapper-level semantics* from scratch as a small
tokenizing parser. Its behavior is pinned by a 55-case golden table
(``tests/fixtures/waxeye_goldens.json``) captured behaviorally from the
reference parser — including its quirks:

- an all-caps town ('1111 BUDAPEST, ...') is NOT recognized as a city, but
  the housenumber is still extracted;
- a district specifier ('Budapest V. kerület') makes the whole parse fail;
- without a recognized city the street is dropped (the grammar's wStreet
  nonterminal, which the wrapper ignores) while housenumber/hrsz survive;
- the street-type token is preserved verbatim ('Utca', 'U.') and only the
  exact lowercase 'u.' is expanded to 'utca' (address.py:337-338);
- 'N/x', 'N.x' and a trailing lone letter all produce 'N/x' housenumbers;
- '<num>/<num> hrsz' (any case) is a conscription number; 'hrsz <num>/<num>'
  is not.

The reference's own test for this path is broken (test_address.py:115-133
indexes fixture keys that don't exist), so the golden table here is the
only executable parity evidence either repo has.
"""

from __future__ import annotations

import re

from .hu_address import clean_string

# Street-type vocabulary the reference grammar recognizes as a standalone
# `type` token (probed behaviorally; dotted abbreviations included).
STREET_TYPES = frozenset(
    {
        "utca", "út", "tér", "körút", "sétány", "köz", "sor", "rakpart",
        "lakótelep", "útja", "tere", "fasor", "dűlő", "sugárút", "árok",
        "határút", "kapu", "lépcső", "park", "udvar", "u.", "krt.", "ltp.",
    }
)

_RX_COMMENT = re.compile(r"\s*\([^)]*\)\s*$")
_RX_POSTCODE = re.compile(r"^(\d{4})[.,]?\s+")
_RX_CITY_COMMA = re.compile(r"^([A-ZÁÉÍÓÖŐÚÜŰ][a-záéíóöőúüű]+)\s*,\s*")
_RX_CITY_BARE = re.compile(r"^([A-ZÁÉÍÓÖŐÚÜŰ][a-záéíóöőúüű]+)\s+")
_RX_CSN = re.compile(r"(\d+/\d+)\.?\s*hrsz\.?", re.IGNORECASE)
_RX_ROMAN_DISTRICT = re.compile(r"^[IVXLCDM]+\.")
_RX_DOT_DIGIT = re.compile(r"(?<=[^\W\d_])\.(?=\d)")
_RX_HN = re.compile(r"^(\d+(?:-\d+)?)\.?$")
_RX_HN_SLASH = re.compile(r"^(\d+(?:-\d+)?)/([A-Za-zÁÉÍÓÖŐÚÜŰáéíóöőúüű])\.?$")
_RX_HN_DOT = re.compile(r"^(\d+(?:-\d+)?)\.([A-Za-zÁÉÍÓÖŐÚÜŰáéíóöőúüű])$")
_RX_LONE_LETTER = re.compile(r"^[A-Za-zÁÉÍÓÖŐÚÜŰáéíóöőúüű]$")

_NONES = (None, None, None, None, None)


def parse_hu_address(value):
    """Structured parse → (postcode, city, street, housenumber, csn).

    Wrapper-level equivalent of the reference's
    ``extract_all_address_waxeye`` (address.py:315-356); see module
    docstring for the pinned quirks.
    """
    cleaned = clean_string(value)
    if not cleaned:
        return _NONES
    s = _RX_COMMENT.sub("", cleaned).strip()

    postcode = None
    m = _RX_POSTCODE.match(s)
    if m:
        postcode = m.group(1)
        s = s[m.end():]

    city = None
    m = _RX_CITY_COMMA.match(s)
    if m is None and postcode is not None:
        m = _RX_CITY_BARE.match(s)
    if m:
        city = m.group(1)
        s = s[m.end():]
        if _RX_ROMAN_DISTRICT.match(s):
            # district specifier — the reference grammar rejects the input
            return _NONES

    csn = None
    m = _RX_CSN.search(s)
    if m:
        csn = m.group(1)
        s = (s[: m.start()] + " " + s[m.end():]).strip()

    # 'U.1' → 'U. 1' so a type glued to the number still tokenizes
    s = _RX_DOT_DIGIT.sub(". ", s)
    tokens = [t.strip(",") for t in s.split() if t.strip(",")]

    housenumber = None
    sub = None
    street_tokens = tokens
    for i, tok in enumerate(tokens):
        hm = _RX_HN.match(tok) or _RX_HN_SLASH.match(tok) or _RX_HN_DOT.match(tok)
        if hm:
            housenumber = hm.group(1)
            if hm.lastindex and hm.lastindex >= 2:
                sub = hm.group(2)
            elif i + 1 == len(tokens) - 1 and _RX_LONE_LETTER.match(tokens[i + 1]):
                sub = tokens[i + 1]
            street_tokens = tokens[:i]
            break
    if housenumber is not None and sub is not None:
        housenumber = f"{housenumber}/{sub}"

    street = None
    if city is not None and street_tokens:
        last = street_tokens[-1]
        if last.lower() in STREET_TYPES and len(street_tokens) > 1:
            stype = last.replace("u.", "utca")
            street = " ".join(street_tokens[:-1]) + " " + stype
        else:
            street = " ".join(street_tokens)
    return postcode, city, street, housenumber, csn


# API-parity alias: the reference exposes this under the waxeye name.
extract_all_address_waxeye = parse_hu_address
