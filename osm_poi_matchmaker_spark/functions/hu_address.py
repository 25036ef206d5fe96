# -*- coding: utf-8 -*-
"""Hungarian address / contact normalization — scalar semantics layer.

Reimplements (from scratch, behavior pinned by the reference's golden test
tables in /root/reference/test/test_address*.py) the cleaning functions of
``osm_poi_matchmaker/libs/address.py``. These define the engine's per-row
invariants: extracted values must match the reference byte-for-byte
(BASELINE.json input_hint), so semantics — including documented quirks —
are preserved exactly.

The two big normalization TABLES (street-type vocabulary, abbreviation →
canonical replacements) are data, not code: they are carried verbatim from
the reference (libs/address.py:37-39, 56-210) because output parity is
impossible without them. All executable logic here is new.

Spark integration: these run inside Arrow-batched pandas UDFs
(:mod:`.spark_udfs`) — vectorized batch transfer, scalar apply per batch,
never row-at-a-time Python UDFs in a join path.
"""

from __future__ import annotations

import json
import re

# --------------------------------------------------------------------------
# Data tables (reference data, required for byte parity — see module doc)
# --------------------------------------------------------------------------
SZFKL = ". számú főközlekedési út"

# Street-type vocabulary of PATTERN_STREET_RICH (libs/address.py:37-39).
STREET_TYPES = (
    "akna|alja|almáskert|alsó|alsósor|aluljáró|autópálya|autóversenypálya|állomás|árok|átjáró|"
    "barakképület|bánya|bányatelep|bekötőút|benzinkút|bérc|bisztró|bokor|burgundia|büfé|camping|"
    "campingsor|centrum|célgazdaság|csapás|csarnok|csárda|cser|csoport|domb|dunapart|dunasor|dűlő|"
    "dűlője|dűlők|dűlőút|egyesület|egyéb|elágazás|erdeje|erdészház|erdészlak|erdő|erdősarok|erdősor|"
    "épület|épületek|észak|étterem|falu|farm|fasor|fasora|feketeerdő|feketeföldek|felső|felsősor|"
    "fennsík|fogadó|fok|forduló|forrás|föld|földek|földje|főcsatorna|főtér|főút|fürdő|fürdőhely|"
    "fürésztelepe|gazdaság|gát|gátőrház|gátsor|gimnázium|gödör|gulyakút|gyár|gyártelep|halom|"
    "határátkelőhely|határrész|határsor|határút|hatházak|hát|ház|háza|házak|hegy|hegyhát|"
    "hegyhát dűlő|hely|hivatal|híd|hídfő|horgásztanya|hotel|intézet|ipari park|ipartelep|"
    "iparterület|irodaház|irtás|iskola|jánoshegy|járás|juhászház|kapcsolóház|kapu|kastély|kálvária|"
    "kemping|kert|kertek|kertek-köze|kertsor|kertváros|kerület|kikötő|kilátó|kishajtás|kitérő|"
    "kocsiszín|kolónia|korzó|kórház|környék|körönd|körtér|körút|körútja|körvasútsor|körzet|köz|köze|"
    "középsor|központ|kút|kútház|kültelek|külterület|külterülete|lakás|lakások|lakóház|lakókert|"
    "lakónegyed|lakópark|lakótelep|laktanya|legelő|lejáró|lejtő|lépcső|liget|lovasiskola|lovastanya|"
    "magánút|major|malom|malomsor|megálló|mellékköz|mező|mélyút|MGTSZ|munkásszálló|műút|nagymajor|"
    "nagyút|nádgazdaság|nyaraló|oldal|országút|otthon|otthona|öböl|öregszőlők|ösvény|ötház|őrház|"
    "őrházak|pagony|pallag|palota|park|parkfalu|parkja|parkoló|part|pavilonsor|pálya|pályafenntartás|"
    "pályaudvar|piac|pihenő|pihenőhely|pince|pinceköz|pincesor|pincék|présházak|puszta|rakodó|"
    "rakpart|repülőtér|rész|rét|rétek|rév|ring|sarok|sertéstelep|sétatér|sétány|sikátor|sor|sora|"
    "sportpálya|sporttelep|stadion|strand|strandfürdő|sugárút|szabadstrand|szakiskola|szállás|"
    "szálló|szárító|szárnyasliget|szektor|szer|szél|széle|sziget|szigete|szivattyútelep|szög|szőlő|"
    "szőlőhegy|szőlők|szőlőkert|szőlős|szőlősor|tag|tanya|tanyaközpont|tanyasor|tanyák|tavak|tábor|"
    "tároló|társasház|teherpályaudvar|telek|telep|telepek|település|temető|tere|terményraktár|"
    "terület|teteje|tető|téglagyár|tér|tipegő|tormás|torony|tó|tömb|TSZ|turistaház|udvar|udvara|"
    "ugarok|utca|utcája|újfalu|újsor|újtelep|útfél|útgyűrű|útja|út|üdülő|üdülő központ|üdülő park|"
    "üdülők|üdülőközpont|üdülőpart|üdülő-part|üdülősor|üdülő-sor|üdülőtelep|üdülő-telep|"
    "üdülőterület|ürbő|üzem|üzletház|üzletsor|vadászház|varroda|vasútállomás|vasúti megálló|"
    "vasúti őrház|vasútsor|vám|vár|város|városrész|vásártér|vendéglő|vég|villa|villasor|viztároló|"
    "vízmű|vízmű telep|völgy|zsilip|zug|ltp\\.|ltp|krt\\.|krt|sgt\\.|u\\.|u\\s+|Várkerület"
)

# Abbreviation/typo → canonical street replacements (libs/address.py:56-210).
STREET_REPLACEMENTS = (
    ("Nyúl 82. sz. főút", "Kossuth Lajos út"),
    ("Nyúl  82. sz. főút", "82" + SZFKL),
    ("Budafoki út, 6-os sz. főút", "6" + SZFKL),
    (". Sz. Főút felső", SZFKL),
    (". számú - Némedi út sarok", SZFKL),
    ("076/15. hrsz 86. számú főút mellett", "86" + SZFKL),
    ("50.sz.út jobb oldal", "50" + SZFKL),
    (". sz. fkl.út", SZFKL),
    (".sz. fkl. út", SZFKL),
    ("-es sz. főút", SZFKL),
    (". sz. főút", SZFKL),
    (".sz.fkl.", ". számú főközlekedési"),
    (". sz. fkl.", ". számú főközlekedési"),
    (". számú fkl. út", SZFKL),
    (". Sz. főút", SZFKL),
    (". számú főút", SZFKL),
    (". főút", SZFKL),
    (". sz út", SZFKL),
    (" sz. főút", SZFKL),
    ("-es fő út", SZFKL),
    ("-es főút", SZFKL),
    (" - es út", SZFKL),
    ("-es út", SZFKL),
    ("-as fő út", SZFKL),
    ("-as főút", SZFKL),
    (" - as út", SZFKL),
    ("-as út", SZFKL),
    ("-ös fő út", SZFKL),
    ("-ös főút", SZFKL),
    (" - ös út", SZFKL),
    ("-ös út", SZFKL),
    ("Omsz park", "Omszk park"),
    ("01.máj.", "Május 1."),
    ("15.márc.", "Március 15."),
    ("Ady E.", "Ady Endre"),
    ("Áchim A.", "Áchim András"),
    ("Bajcsy-Zs. E.", "Bajcsy-Zsilinszky Endre"),
    ("Bajcsy-Zs. E. u.", "Bajcsy-Zsilinszky Endre utca"),
    ("Bajcsy-Zs. u.", "Bajcsy-Zsilinszky utca"),
    ("Bajcsy Zs.u.", "Bajcsy-Zsilinszky utca"),
    ("Bajcsy Zs. u.", "Bajcsy-Zsilinszky utca"),
    ("Bajcsy-Zs.", "Bajcsy-Zsilinszky"),
    ("Bajcsy Zs.", "Bajcsy-Zsilinszky"),
    ("Bartók B.", "Bartók Béla"),
    ("Baross G.", "Baross Gábor"),
    ("BERCSÉNYI U.", "Bercsényi Miklós utca"),
    ("Berzsenyi D.", "Berzsenyi Dániel"),
    ("Borics P.", "Borics Pál"),
    ("Corvin J.", "Corvin"),
    ("Dózsa Gy.u.", "Dózsa György utca"),
    ("Dózsa Gy.", "Dózsa György"),
    ("dr. Géfin Lajos", "Dr. Géfin Lajos"),
    ("Erkel F.", "Erkel Ferenc"),
    ("Hegedű/(Király)", "Hegedű"),
    ("Hevesi S.", "Hevesi Sándor"),
    ("Hunyadi J.", "Hunyadi János"),
    ("Ii. Rákóczi Ferenc", "II. Rákóczi Ferenc"),
    ("Innovációs kp. Fő út", "Fő út"),
    ("Ix. körzet", "IX. körzet"),
    ("Kölcsey F.", "Kölcsey Ferenc"),
    ("Kiss J.", "Kiss József"),
    ("Nagy L. király", "Nagy Lajos király"),
    ("Kaszás u. 2.-Dózsa György út", "Dózsa György út"),
    ('Váci út 117-119. „A" épület', "Váci út"),
    ("56-Osok tere", "Ötvenhatosok tere"),
    ("11-es út", "11. számú főközlekedési út"),
    ("11-es Huszár út", "Huszár út"),
    ("Kölcsey-Pozsonyi út sarok", "Kölcsey Ferenc utca "),
    ("Március 15-e", "Március 15."),
    ("Tiszavasvári út - Alkotás u sarok", "Tiszavasvári út"),
    ("Tiszavasvári út- Alkotás út sarok", "Tiszavasvári út"),
    ("Hőforrás-Rákóczi utca", "Rákóczi utca"),
    ("Kiss Tábornok - Kandó Kálmán utca sarok", "Kiss Tábornok utca"),
    ("Soroksári út - Határ út sarok", "Soroksári út"),
    ("Szentendrei- Czetz János utca sarok", "Szentendrei út"),
    ("Külső - Kádártai utca", "Külső-Kádártai utca"),
    ("Károlyi út - Ságvári út", "Károlyi Mihály utca"),
    ("Szlovák út - Csömöri út sarok", "Szlovák út"),
    ("Maglódi út - Jászberényi út sarok", "Maglódi út"),
    ("Dobogókői út- Kesztölci út sarok", "Dobogókői út"),
    ("DR. KOCH L. UTCA", "Dr. Koch László utca"),
    ("DR KOCH L.", "Dr. Koch László"),
    ("Koch L.u.", "Dr. Koch László utca"),
    ("Kiss J. ", "Kiss József"),
    ("Kossuth L.u.", "Kossuth Lajos utca "),
    ("Kossuth L.", "Kossuth Lajos"),
    ("Kossuth F. u", "Kossuth Ferenc utca"),
    ("Kossuth F.", "Kossuth Ferenc"),
    ("Korányi F.", "Korányi Frigyes"),
    ("Kőrösi Csoma S.", "Kőrösi Csoma Sándor"),
    ("Páter K.", "Páter Károly"),
    ("Petőfi S.", "Petőfi Sándor"),
    ("Somogyi B.", "Somogyi Béla"),
    ("Szondy", "Szondi"),
    ("Szt.István", "Szent István"),
    ("szt.istván", "Szent István"),
    ("Táncsics M.", "Táncsics Mihály"),
    ("Vass J.", "Vass János"),
    ("Vámház.", "Vámház"),
    ("Várkörút .", "Várkörút"),
    ("Vásárhelyi P.", "Vásárhelyi Pál"),
    ("Vi. utca", "VI. utca"),
    ("XXI. II. Rákóczi Ferenc", "II. Rákóczi Ferenc"),
    ("Zsolnay V.", "Zsolnay Vilmos"),
    ("Radnóti M.", "Radnóti Miklós"),
    ("Fehérvári út (Andor u. 1.)", "Fehérvári"),
    ("Szent István kir.", "Szent István király"),
    ("Dr Batthyány S. László", "Dr. Batthyány-Strattmann László"),
    ("Bacsinszky A.", "Bacsinszky András"),
    ("Fáy A.", "Fáy András"),
    ("József a.", "József Attila"),
    ("Juhász Gy. ", "Juhász Gyula"),
    ("Hock j.", "Hock János"),
    ("Vak B.", "Vak Bottyán"),
    ("Arany J.", "Arany János"),
    ("Könyves K.", "Könyves Kálmán"),
    ("Szilágyi E.", "Szilágyi Erzsébet"),
    ("Liszt F.", "Liszt Ferenc"),
    ("Bethlen G.", "Bethlen Gábor"),
    ("Gazdag E.", "Gazdag Erzsi"),
    ("Hátsókapu.", "Hátsókapu"),
    ("Herman O.", "Herman Ottó"),
    ("József A.", "József Attila"),
    ("Kazinczy F.", "Kazinczy Ferenc"),
    ("Király J.", "Király Jenő"),
    ("Királyhidai utca", "Királyhidai út"),
    ("Lackner K.", "Lackner Kristóf"),
    ("Mécs L.", "Mécs László"),
    ("Nagyváthy J.", "Nagyváthy János"),
    ("Szent I. kir.", "Szent István király"),
    ("Szigethy A. u.", "Szigethy Attila út"),
    ("Rákóczi F.", "Rákóczi Ferenc"),
    ("Jókai M.", "Jókai Mór"),
    ("Szabó D.", "Szabó Dezső"),
    ("Móricz Zs.", "Móricz Zsigmond"),
    ("Hunyadi J ", "Hunyadi János"),
    ("Szilágyi E ", "Szilágyi Erzsébet fasor"),
    ("Erzsébet Királyné út", "Erzsébet királyné útja"),
    ("Mammut", ""),
    ("Szt. ", "Szent "),
    (" u.", " utca "),
    (" U.", " utca "),
    (".u.", " utca "),
    (" u ", " utca "),
    (" krt.", " körút"),
    (" Krt.", " körút"),
    (" KRT.", " körút"),
    (" ltp.", " lakótelep"),
    (" Ltp.", " lakótelep"),
    (" LTP.", " lakótelep"),
    (" ltp", " lakótelep"),
    (" sgt.", " sugárút"),
    ("^4. sz$", "4. számú főközlekedési"),
)

CITY_TYPO_FIXES = (("Mikolc", "Miskolc"), ("Iinárcs", "Inárcs"))

# Building-name noise stripped before street parsing (address.py:395-400).
BUILDING_NAME_NOISE = (
    (" - Savoya Park", ""),
    ("Park Center,", ""),
    ("Duna Center", ""),
    ("Family Center,", ""),
    ("Sostói ipari park, ", ""),
)

# --------------------------------------------------------------------------
# Compiled patterns (semantics per address.py:23-43)
# --------------------------------------------------------------------------
_RX_WS = re.compile(r"\s+")
_RX_ROMAN_DISTRICT = re.compile(r"\s?[XVI]{1,5}[.:,]{0,3}\s*$")
_RX_JS_TAIL = re.compile(r"\s*;\s*$")
_RX_HOUSENUMBER = re.compile(r"[0-9]{1,3}(/[A-Za-z]|-[0-9]{1,3}|)", re.IGNORECASE)
_RX_CSN_BEFORE = re.compile(
    r"((?:belterület\s*)?hrsz[.:]{0,2}\s*([0-9]{2,6}(/[0-9]{1,3})?)[.]?)", re.IGNORECASE
)
_RX_CSN_AFTER = re.compile(r"(\s*([0-9]{2,6}(/[0-9]{1,3})?)[.]?\s*hrsz[s.]?)", re.IGNORECASE)
_RX_CSN_BARE = re.compile(r"\d{4,}/\d+")
_RX_OPENING_RANGE = re.compile(r"0*[0-9]{1,2}:0*[0-9]{1,2}\s*-\s*0*[0-9]{1,2}:0*[0-9]{1,2}")
_RX_STREET = re.compile(
    r"\s*(.*)\s+(" + STREET_TYPES + r").*", re.UNICODE | re.IGNORECASE
)
_RX_URL_EXTRA_SLASH = re.compile(r"(?<!:)(//+)")
_RX_POSTCODE_CITY = re.compile(r"^((\d){4})([.\s]{0,2})([a-zA-ZáÁéÉíÍóÓúÚüÜöÖőŐűŰ]{3,40})")
_RX_PHONE_HU = re.compile(r"(\+36|06)?\s*\(?\d{1,2}\)?[-\s]?\d{3}[-\s]?\d{3,4}")

_NULL_SENTINELS = frozenset({"NONE", "NAN", "NULL", "NULLNONE"})


def _apply_pairs(value: str, pairs) -> str:
    for old, new in pairs:
        value = value.replace(old, new)
    return value


# --------------------------------------------------------------------------
# Core string hygiene
# --------------------------------------------------------------------------
def remove_whitespace(value: str, replacement: str = "") -> str:
    """Collapse every whitespace run to ``replacement``."""
    return _RX_WS.sub(replacement, value)


def clean_string(value):
    """Whitespace collapse + NONE/NAN/NULL sentinel → None.

    Byte-parity-critical (BASELINE.json:15): single spaces between words,
    surrounding ``-/, `` stripped, empty/sentinel input → None.
    """
    if value is None:
        return None
    if not isinstance(value, str):
        value = str(value)
    value = remove_whitespace(value, " ")
    if value == "" or value.upper() in _NULL_SENTINELS:
        return None
    parts = value.split()
    if not parts:
        return None
    value = " ".join(parts).strip("-/, ")
    if value and value != " " and value.upper() not in _NULL_SENTINELS:
        return value
    return None


def clean_postcode(value):
    value = clean_string(value)
    if value in (None, "", "0"):
        return None
    return value


def clean_url(value):
    value = clean_string(value)
    if value is None:
        return None
    return _RX_URL_EXTRA_SLASH.sub("/", value).lower().strip()


def clean_email(value):
    value = clean_string(value)
    if value is None:
        return None
    parts = value.lower().split()
    if not parts:
        return None
    joined = ";".join(parts)
    for sep in (",", ";"):
        if sep in joined:
            joined = ";".join(joined.split(sep))
    return joined


def clean_city(value):
    """District/roman-numeral strip, typo fixes, first token, Title-case.

    Preserves the reference's ``str.title()`` behavior (address.py:537) —
    NOT Spark ``initcap`` (they differ on 'Bajcsy-Zsilinszky')."""
    value = clean_string(value)
    if value is None:
        return None
    city = _RX_ROMAN_DISTRICT.sub("", value)
    city = _apply_pairs(city, CITY_TYPO_FIXES)
    for sep in ("-", ",", "/", "(", " "):
        city = city.split(sep)[0]
    city = clean_string(city)
    return city.title() if city is not None else None


def clean_street(value):
    if value is None:
        return None
    street = clean_string(str(value))
    if str(value) == "":
        return ""
    if street is None:
        return None
    return clean_string(_apply_pairs(street, STREET_REPLACEMENTS))


def clean_street_type(value):
    street = clean_string(value)
    if street is None or value == "":
        return None
    for old, new in (
        ("fkl. út", "főközlekedési út"),
        ("főút", "főközlekedési út"),
        ("ltp.", " lakótelep"),
        ("LTP.", " lakótelep"),
        ("pu.", "pályaudvar"),
        ("út.", "út"),
        ("u.", "utca"),
        ("(nincs)", ""),
        (".", ""),
    ):
        street = street.replace(old, new)
    return clean_string(street)


def clean_branch(value):
    if value is None or value == "":
        return None
    branch = clean_string(str(value))
    if branch is not None:
        branch = _apply_pairs(
            branch,
            (
                ("Sz.", "számú"),
                ("Számú", "számú"),
                ("Fiók", "fiók"),
                ("Központi", "központi"),
                ("Ügyfélszolgálat", "ügyfélszolgálat"),
                ("Atm", "ATM"),
                ("U.", "utca"),
                ("Üzletház", "üzletház"),
                ("Porta", "porta"),
                ("Zaeg", "Zalaegerszeg"),
                ("Bevásárlóközpont", "bevásárlóközpont"),
            ),
        )
    return clean_string(branch)


def replace_html_newlines(value):
    if value is None:
        return None
    text = clean_string(str(value))
    text = _apply_pairs(
        text,
        (("<br>", "; "), ("</br>", "; "), ("< br />", "; "), ("<br />", "; "), (" ;", ";")),
    )
    return clean_string(text)


def clean_javascript_variable(value: str, varname: str) -> str:
    """Strip ``var <name> = ... ;`` wrapping from an embedded JSON blob."""
    stripped = re.sub(r"^\s*var\s*{}\s*=\s*".format(varname), "", value)
    return _RX_JS_TAIL.sub("", stripped)


# --------------------------------------------------------------------------
# Opening-hours scalar cleaners
# --------------------------------------------------------------------------
def clean_opening_hours(value):
    """'6:44-21:00 …' → ('06:44', '21:00'); no range → (None, None)."""
    match = _RX_OPENING_RANGE.search(value)
    if match is None:
        return None, None
    compact = "".join(match.group(0).split())
    halves = compact.split("-")
    if len(halves) != 2:
        return None, None
    return halves[0].zfill(5), halves[1].zfill(5)


def clean_opening_hours_2(value):
    """'600' → '06:00'; '-1' → None (zfill4 + colon insert)."""
    if value == "-1":
        return None
    padded = value.strip().zfill(4)
    return f"{padded[:2]}:{padded[-2:]}"


# --------------------------------------------------------------------------
# Phone normalization (reference used the `phonenumbers` lib — unavailable
# here, so this is an HU-specific formatter reproducing the same
# INTERNATIONAL output for valid Hungarian numbers)
# --------------------------------------------------------------------------
_HU_MOBILE_AREAS = frozenset({"20", "30", "31", "50", "70"})
MOBILE_HU_PHONE_PREFIXES = (
    "20", "30", "31", "50", "70",
    "+3620", "+3630", "+3631", "+3650", "+3670",
    "0620", "0630", "0631", "0650", "0670",
)


def _format_hu_number(raw: str):
    """One candidate number → '+36 AA XXX XXXX' international form, or
    None when it can't be a valid Hungarian number."""
    digits = re.sub(r"\D", "", raw)
    if not digits:
        return None
    if raw.lstrip().startswith("+"):
        if not digits.startswith("36"):
            return None
        national = digits[2:]
    elif digits.startswith("06"):
        national = digits[2:]
    elif digits.startswith("36") and len(digits) >= 10:
        national = digits[2:]
    else:
        national = digits
    if national.startswith("1") and len(national) == 8:
        area, sub = "1", national[1:]
    elif national[:2] in _HU_MOBILE_AREAS and len(national) == 9:
        area, sub = national[:2], national[2:]
    elif len(national) == 8:
        area, sub = national[:2], national[2:]
    else:
        return None
    if len(sub) == 6:
        grouped = f"{sub[:3]} {sub[3:]}"
    else:
        grouped = f"{sub[:3]} {sub[3:]}"
    return f"+36 {area} {grouped}"


def clean_phone(value):
    """Free-text phone field → list of international numbers (or None).

    Splitting mirrors the reference (address.py:567-603): drop everything
    from '(' on, '-'→' ', ','→';', then per-';' candidate parse."""
    phone = clean_string(str(value))
    if phone is None or phone == "":
        return None
    if "(" in phone:
        phone = phone.split("(")[0]
    phone = phone.replace("-", " ")
    if "," in phone:
        phone = phone.replace(",", ";")
    candidates = phone.split(";") if ";" in phone else [phone]
    out = []
    for cand in candidates:
        formatted = _format_hu_number(cand.replace("(", "").replace(")", ""))
        if formatted is not None:
            out.append(formatted)
    return out if out else None


def clean_phone_to_str(value):
    if value is None:
        return None
    numbers = clean_phone(clean_string(value))
    return ";".join(numbers) if numbers else None


def clean_phone_and_mobile_to_str(phone, mobile=None):
    """Split cleaned numbers into (landline_str, mobile_str)."""
    if not phone and not mobile:
        return None, None
    all_numbers = (clean_phone(clean_string(phone)) or []) + (
        clean_phone(clean_string(mobile)) or []
    )
    landlines, mobiles = [], []
    for number in all_numbers:
        compact = number.replace(" ", "").replace("-", "").replace("/", "")
        national = compact[3:] if compact.startswith("+36") else compact
        if any(national.startswith(p) for p in MOBILE_HU_PHONE_PREFIXES):
            mobiles.append(number)
        else:
            landlines.append(number)
    return (";".join(landlines) or None, ";".join(mobiles) or None)


def extract_phone_number(value):
    """Find the first Hungarian phone number embedded in free text/HTML."""
    try:
        text = str(value).replace("<br>", " ").replace("</br>", " ")
        match = _RX_PHONE_HU.search(text)
        if not match:
            return None
        raw = match.group()
        if not raw.startswith("+36"):
            raw = "+36 " + raw.lstrip("06").strip()
        return _format_hu_number(raw)
    except Exception:
        return None


# --------------------------------------------------------------------------
# Street / housenumber / conscription-number extraction
# --------------------------------------------------------------------------
def extract_street_housenumber_better_2(value):
    """Hungarian address line → (street, housenumber, conscriptionnumber).

    Algorithm (semantics of address.py:380-464, incl. its slicing quirks —
    the housenumber search window is offset by len(street)+len(type)
    WITHOUT the separating spaces, deliberately):

    1. strip building names, cut at '(' ;
    2. conscription number via 3 patterns (hrsz-before / hrsz-after / bare
       NNNN/N);
    3. abbreviation table → canonical street, then the street-type
       vocabulary regex splits (street, type);
    4. housenumber regex in the post-street window (minus the csn span).
    """
    if value is None:
        return None, None, None
    value = str(value)
    if value.strip() == "":
        return None, None, None
    cleaned = clean_string(value)
    if cleaned is None:
        return None, None, None
    cleaned = _apply_pairs(cleaned, BUILDING_NAME_NOISE)
    data = cleaned.split("(")[0]

    csn, csn_span = None, None
    for rx, group in ((_RX_CSN_BEFORE, 2), (_RX_CSN_AFTER, 2), (_RX_CSN_BARE, 0)):
        m = rx.search(data)
        if m is not None:
            csn = m.group(group)
            csn_span = len(m.group(0))
            break

    street, housenumber, street_type = None, None, None
    corrected = clean_street(data)
    m = _RX_STREET.search(corrected)
    if m is not None:
        street, street_type = m.group(1), m.group(2)
        if street_type not in ("Vám",):
            street_type = street_type.lower()
        window = corrected[len(street) + len(street_type):]
        if csn_span is not None:
            window = window[: len(window) - csn_span] if csn_span <= len(window) else ""
        hn = _RX_HOUSENUMBER.search(window)
        if hn is not None:
            housenumber = hn.group(0).replace(".", "").replace("–", "-").upper()

    street = clean_string(street)
    housenumber = clean_string(housenumber)
    csn = clean_string(csn)
    if street_type is not None:
        return f"{street} {clean_string(street_type)}", housenumber, csn
    return street, housenumber, csn


def extract_street_housenumber(value):
    """Legacy splitter: last token = housenumber, rest = street
    (semantics of address.py:266-289).

    Both halves start from the text before any '(' and are clean_string-ed;
    the housenumber loses '.'s, maps en-dash to '-', and is uppercased; the
    street drops its last space-separated token and expands u./krt.
    """
    head = value.split("(")[0]
    housenumber = clean_string(head)
    if housenumber is not None:
        housenumber = (
            housenumber.split(" ")[-1].replace(".", "").replace("–", "-").upper()
        )
    street = clean_string(head)
    if street is not None:
        street = street.rsplit(" ", 1)[0]
        street = street.replace(" u.", " utca").replace(" u ", " utca")
        street = street.replace(" krt.", " körút")
    return street, housenumber


_RX_CITY_LEAD = re.compile(r"^([a-zA-ZáÁéÉíÍóÓúÚüÜöÖőŐűŰ]{3,40})")


def extract_city_street_housenumber_address(value):
    """'City, street hn' → (city, street, hn, csn) — address.py:359-377.

    Mirrors the reference's inconsistent arity: None / '' inputs return a
    5-tuple of Nones, parsed inputs a 4-tuple (callers index, not unpack).
    """
    if value is None or value == "":
        return None, None, None, None, None
    cleaned = clean_string(value)
    m = _RX_CITY_LEAD.search(cleaned)
    city = clean_string(m.group(1)) if m else None
    parts = cleaned.split(",")
    if len(parts) > 1:
        street, housenumber, csn = extract_street_housenumber_better_2(parts[1].strip())
        return city, street, housenumber, csn
    return city, None, None, None


def clean_phone_to_json(value):
    """clean_phone, serialized as a JSON array string (address.py:606-614)."""
    if value is None:
        return None
    numbers = clean_phone(clean_string(value))
    return json.dumps(numbers) if numbers is not None else None


def extract_all_address(value):
    """'PPPP City, street hn' → (postcode, city, street, hn, csn) —
    the regex fallback path (address.py:291-312)."""
    if value is None or value == "":
        return None, None, None, None, None
    cleaned = clean_string(value)
    m = _RX_POSTCODE_CITY.search(cleaned)
    postcode = m.group(1) if m else None
    city = m.group(4) if m else None
    if len(cleaned.split(",")) > 1:
        rest = cleaned.split(",")[-1].strip()
    else:
        rest = " ".join(cleaned.split(" ")[2:]).strip()
    street, housenumber, csn = extract_street_housenumber_better_2(rest)
    return postcode, city, street, housenumber, csn
