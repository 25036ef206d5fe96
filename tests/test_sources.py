"""Source-reader tests over tiny in-repo fixtures (formats S10–S14)."""

from __future__ import annotations

import os

import pytest

from osm_poi_matchmaker_spark.sources.readers import (
    read_csv_source,
    read_excel_source,
    read_geojson_features,
    read_gtfs_stops,
    read_zipcodes_xml,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_csv_source(spark):
    df = read_csv_source(spark, f"{FIX}/sample.tsv")
    rows = {r["name"]: r for r in df.collect()}
    assert set(rows) == {"Tesco", "Spar"}
    assert rows["Tesco"]["lat"] == 47.5


def test_geojson_hu_filter(spark):
    feats = read_geojson_features(spark, f"{FIX}/sample.geojson")
    names = {r["properties"]["name"] for r in feats.collect()}
    # HU-tagged + bbox-inside kept; Paris (outside, no country) and
    # Vienna (AT) dropped
    assert names == {"Tesco Expressz", "NoCountryInside"}


def test_gtfs_stops(spark):
    stops = read_gtfs_stops(spark, f"{FIX}/gtfs.zip")
    got = {r["stop_id"]: r["stop_name"] for r in stops.collect()}
    assert got == {"S1": "Budapest-Nyugati", "S2": "Szeged"}


def test_zipcodes_xml(spark):
    dim = read_zipcodes_xml(spark, f"{FIX}/zipcodes.xml")
    got = dict((r["city_post_code"], r["city_name"]) for r in dim.collect())
    assert got == {"1011": "Budapest", "9737": "Buk"}


def test_street_types_xml(spark):
    """hu_generic.py:79-103 quirks: None-text elements (self-closed)
    skipped, text stripped, whitespace-only survives as ''."""
    from osm_poi_matchmaker_spark.sources.readers import read_street_types_xml

    got = [r["street_type"]
           for r in read_street_types_xml(spark, f"{FIX}/street_types.xml").collect()]
    assert got == ["utca", "körút", "tér", "", "sétány"]


def test_poi_patch_csv(spark):
    """hu_generic.py:105-123 + data_handlers.py:632-658 quirks: tab
    separator, NaN->None->str() literal 'None', gapped int columns
    render pandas floats."""
    from osm_poi_matchmaker_spark.sources.readers import read_poi_patch_csv

    rows = read_poi_patch_csv(spark, f"{FIX}/poi_patch.csv").collect()
    assert len(rows) == 3
    by_code = {(r["poi_code"], r["orig_city"]): r for r in rows}
    erd = by_code[("*", "Erd")]
    assert erd["orig_postcode"] == "2030.0"   # float-inferred column
    assert erd["new_postcode"] == "2030"      # gap-free int column
    assert erd["orig_name"] == "None"         # str(None) literal
    gyor = by_code[("*", "Gyor")]
    assert gyor["orig_postcode"] == "None"
    assert gyor["orig_conscriptionnumber"] == "hrsz 4/1"


def test_excel_sheet_parse(spark):
    """S12 raw sheet read: header row becomes columns, ints stay ints,
    empty cells become NULL (from-scratch stdlib XLSX parser)."""
    df = read_excel_source(spark, f"{FIX}/cities.xlsx", "Települések")
    assert df.columns == ["Irányítószám", "Településnév", "Településrész"]
    rows = {r["Irányítószám"]: r for r in df.collect()}
    assert rows[2000]["Településnév"] == "Szentendre"
    assert rows[2000]["Településrész"] is None
    assert rows[6000]["Településrész"] == "Hetényegyháza"


def test_excel_missing_sheet(spark):
    with pytest.raises(KeyError, match="Nope"):
        read_excel_source(spark, f"{FIX}/cities.xlsx", "Nope")


def test_excel_city_postcodes_semantics(spark):
    """hu_generic.process parity: main sheet minus Településrész, big-city
    sheets renamed + constant city, dedup keep-first on postcode."""
    from osm_poi_matchmaker_spark.sources.readers import read_city_postcodes_xlsx

    dim = read_city_postcodes_xlsx(spark, f"{FIX}/cities.xlsx")
    got = sorted((r["city_post_code"], r["city_name"]) for r in dim.collect())
    assert got == [
        (1011, "Budapest"),  # 1011 appears twice in Bp.u. — first kept, once
        (1052, "Budapest"),
        (2000, "Szentendre"),
        (2030, "Érd"),
        (3525, "Miskolc"),
        (6000, "Kecskemét"),
        (9400, "Sopron"),
    ]


def test_tesco_provider_mapping(spark):
    """hu_tesco.py:83-140 parity: coordinate swap, whitespace collapse,
    goldid strip, phone normalization, opening key mapping, and the
    4-way code classification with both S-Market city exceptions."""
    from osm_poi_matchmaker_spark.sources.providers import tesco_stores

    city = spark.createDataFrame(
        [("10001", "Budapest"), ("10002", "Győr"), ("10003", "Miskolc"),
         ("10004", "Szeged"), ("10005", "Levél")],
        ["ref", "city"],
    )
    rows = {
        r["ref"]: r
        for r in tesco_stores(spark, f"{FIX}/tesco.json", city).collect()
    }
    assert rows["10001"]["code"] == "hutescoexp"
    assert rows["10001"]["branch"] == "Tesco Fogarasi"  # whitespace collapsed
    assert rows["10002"]["code"] == "husmrktexp"  # 'xpres' but Győr
    assert rows["10003"]["code"] == "hutescoext"
    # store 3 feed has lat/lon swapped; check_hu_boundary fixes it
    assert rows["10003"]["lat"] == 48.1035 and rows["10003"]["lon"] == 19.0735
    assert rows["10003"]["phone"] == "+36 46 123 456"
    assert rows["10004"]["code"] == "hutescosup"
    assert rows["10005"]["code"] == "husmrktsup"  # Levél supermarket exception
    assert rows["10001"]["su_open"] == "07:00"  # key "0" = Sunday
    # without a resolved-city frame the exception lists never match
    no_city = {
        r["ref"]: r["code"]
        for r in tesco_stores(spark, f"{FIX}/tesco.json").collect()
    }
    assert no_city["10002"] == "hutescoexp"
    assert no_city["10005"] == "hutescosup"


def test_xlsx_roundtrip_inline_and_types():
    """Writer↔parser: bools, floats, rich strings, ragged rows."""
    from osm_poi_matchmaker_spark.sources.xlsx import parse_xlsx, write_xlsx

    rows = [
        ["a", "b", "c"],
        [1, 2.5, True],
        ["x&<y>", None, False],
    ]
    out = parse_xlsx(write_xlsx({"S": rows}), "S")
    assert out == [
        ["a", "b", "c"],
        [1, 2.5, True],
        ["x&<y>", None, False],
    ]


def test_spar_provider_mapping(spark):
    """hu_spar.py:72-106 semantics: classification on the ORIGINAL name,
    INTERSPAR/SPAR rewrite afterwards (DESPAR → 'DESpar'), '(…)' ref."""
    from osm_poi_matchmaker_spark.sources.providers import spar_stores

    rows = {
        r["original"]: r
        for r in spar_stores(spark, os.path.join(FIX, "spar.json")).collect()
    }
    expressz = rows["Teréz körút 55-57."]
    assert expressz["code"] == "husparecon"  # 'expressz' contains 'xpres'
    assert expressz["ref"] == "2041"
    despar = rows["Arany János utca 6-8."]
    assert despar["code"] == "huspardcon"
    assert despar["branch"] == "DESpar"  # replace('SPAR','Spar') quirk
    inter = rows["József Attila utca 87."]
    assert inter["code"] == "husparisup"
    assert (inter["lat"], inter["lon"]) == (48.1122, 20.7895)  # swapped feed
    assert rows["Fő út 1."]["ref"] is None  # no '(…)' group


def test_cba_provider_mapping(spark):
    """hu_cba.py:66-105 semantics: JS-var slice → from_json → explode;
    Príma classification; clean_opening_hours_2 per day."""
    from osm_poi_matchmaker_spark.sources.providers import cba_stores

    with open(os.path.join(FIX, "cba.html"), "rb") as f:
        raw = f.read()
    pages = spark.createDataFrame([(raw,), (b"<p>no script here</p>",)], "html binary")
    rows = {r["branch"]: r for r in cba_stores(pages).collect()}
    assert len(rows) == 4  # scriptless page contributes nothing
    assert rows["Príma Mammut"]["code"] == "huprimacon"
    assert rows["CBA Abc"]["code"] == "hucbacon"
    assert rows["CBA Abc"]["mo_open"] == "06:30"  # '630' zfill+colon
    assert rows["CBA Abc"]["su_open"] is None  # '-1' sentinel
    assert rows["Príma Mammut"]["lat"] == 47.5095  # swapped feed coords
    assert rows["Príma Hegyvidék"]["mo_open"] == "07:00"  # '  700' strip+zfill
    assert rows["CBA Abc"]["phone"] == "+36 1 470 2140"
    assert rows["CBA Abc"]["email"] == "florian@cba.hu"


def test_clean_opening_hours_2_expr_quirks(spark):
    """' -1' is NOT the '-1' sentinel (raw compare) → '00:-1', exactly as
    address.py:558-564 computes it."""
    from osm_poi_matchmaker_spark.sources.providers import _clean_opening_hours_2_expr
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("-1",), (" -1",), ("600",), ("", ), (None,)], "v string"
    ).select(F.col("v"), _clean_opening_hours_2_expr(F.col("v")).alias("oh"))
    got = {r["v"]: r["oh"] for r in df.collect()}
    assert got["-1"] is None
    assert got[" -1"] == "00:-1"
    assert got["600"] == "06:00"
    assert got[""] == "00:00"
    assert got[None] is None


def test_posta_provider_mapping(spark):
    """hu_posta.py:76-217 quirks: single-interval close=from1 bug,
    duplicate-day drop, Csütörtökön alias + Thursday lunch break,
    substring nonstop counting, digit branch rewrite, len<16 guard."""
    from osm_poi_matchmaker_spark.sources.providers import posta_offices

    rows = {
        r["postcode"]: r
        for r in posta_offices(spark, os.path.join(FIX, "posta.xml")).collect()
    }
    assert len(rows) == 4  # the okmányiroda post is skipped
    po = rows["1062"]
    assert po["branch"] == "Budapest 62. számú posta"  # (\d{1,3}) rewrite
    assert po["mo_close"] == "08:00"  # single-interval close=from1 bug
    assert po["tu_open"] is None  # from1==from2 & to1==to2 → dropped
    assert (po["lunch_break_start"], po["lunch_break_stop"]) == ("12:00", "12:30")
    assert (po["th_open"], po["th_close"]) == ("08:00", "18:00")  # Csütörtökön
    assert po["sa_open"] is None  # 'Szombatonként' is not a WeekDaysLongHU name
    cs = rows["1024"]
    assert cs["nonstop"] is True and cs["public_holiday_open"] is True
    assert cs["su_close"] == "0:00"  # the bug again, 7×
    pp = rows["9021"]
    assert (pp["lat"], pp["lon"]) == (47.6832, 17.6354)  # comma + swap
    assert pp["street"] == "Bajcsy-Zsilinszky út"  # type element missing
    mp = rows["3525"]
    assert mp["code"] is None and mp["public_holiday_open"] is None  # 'MP'
    assert mp["housenumber"] is None  # 'belterület HRSZ 3162' len≥16 guard
    assert mp["original"] == "Hősök tere"


def test_atp_types_registry(spark):
    """hu_alltheplaces.py:227-351: first-brand-wins, sanitize+truncate,
    collision skip, keyword type cascade, name derivations."""
    from osm_poi_matchmaker_spark.sources.providers import alltheplaces_types

    rows = {
        r["spider"]: r
        for r in alltheplaces_types(
            spark, os.path.join(FIX, "atp_insights.json")
        ).collect()
    }
    assert len(rows) == 6  # dup spider deduped, collision skipped, AT-only gone
    assert rows["lidl_hu"]["poi_common_name"] == "Lidl"  # first brand wins
    assert rows["obi_hu"]["poi_type"] == "doityourself"  # 'obi_' keyword
    assert rows["obi_hu"]["poi_common_name"] == "OBI"  # q_title fallback
    assert rows["mol_bubi_hu"]["poi_common_name"] == "Mol Bubi"  # _hu dropped
    assert rows["Rossmann-HU Spider"]["poi_code"] == "huatp_rossmann_hu_spider"
    assert rows["hu_sk"]["poi_common_name"] == "Hu_Sk"  # str.title fallback
    assert rows["hu_sk"]["poi_search_name"] == ""  # every segment is 2 chars
    longy = [s for s in rows if s.startswith("megaspider")]
    assert longy == ["megaspider_" + "a" * 50 + "_one"]  # collision skips later


def test_atp_feature_importer(spark):
    """hu_alltheplaces.py:467-556: Point-only, HU filter chains, address
    preference, 'X None' str.format quirk, setter chains."""
    from osm_poi_matchmaker_spark.sources.providers import alltheplaces_pois

    rows = alltheplaces_pois(
        spark, os.path.join(FIX, "atp_spider.geojson"), "tesco_hu"
    ).collect()
    assert len(rows) == 3  # DE, out-of-bbox, LineString, 1-coord all dropped
    by_name = {r["name"]: r for r in rows}
    full = by_name["Tesco Fogarasi"]
    assert full["original"] == "Fogarasi út 15"  # built from separate fields
    assert full["phone"] == "+36 1 467 8800"  # phone setter clean_phone_to_str
    assert full["website"] == "https://tesco.hu/aruhaz"  # clean_url, '//'→'/'
    nohn = by_name["Tesco"]  # name fell back to brand
    assert nohn["original"] == "Váci út None"  # str.format(None) quirk
    assert nohn["ref"] == "node/123"  # @id fallback
    astoria = by_name["Tesco Expressz Astoria"]
    assert (astoria["lat"], astoria["lon"]) == (47.4979, 19.0402)  # swapped
    assert astoria["street"] == "Rákóczi út"  # extractor path from combined
    assert astoria["website"] == "https://tesco.hu/uzletek/astoria"  # @source_uri


def test_posta_json_provider_mapping(spark):
    """hu_posta_json.py:71-106: type mapping, mobilposta pho gap, RAW
    coordinates (no boundary fix in this variant), unknown-type NULLs."""
    from osm_poi_matchmaker_spark.sources.providers import posta_json_offices

    rows = {
        r["postcode"]: r
        for r in posta_json_offices(
            spark, os.path.join(FIX, "posta_json.json")
        ).collect()
    }
    assert rows["4002"]["code"] == "hupostamp"
    assert rows["4002"]["public_holiday_open"] is None  # branch never sets it
    assert rows["1062"]["lat"] == 19.0571  # swapped feed coords kept RAW
    assert rows["9999"]["code"] is None  # unknown type after clear_all
    assert rows["1041"]["postcode"] == "1041"  # ' 1041 ' stripped


def test_foxpost_provider_mapping(spark):
    """hu_foxpost.py:129-189: variant map with NULL-code passthrough,
    falsy-variant / missing-paymentOptions / NULL-`open` row drops,
    kültéri nonstop, clean_opening_hours zfill(5) (incl. the >5-char
    no-op), waxeye overwrite of the feed's zip/city, coordinate swap."""
    from osm_poi_matchmaker_spark.sources.providers import foxpost_lockers

    rows = {
        r["ref"]: r
        for r in foxpost_lockers(spark, os.path.join(FIX, "foxpost.json")).collect()
    }
    # rows 1006 (variant NULL), 1007 (variant ''), 1008 (no paymentOptions),
    # 1009 (truthy non-kültéri description + NULL open) all drop
    assert set(rows) == {"HU0021", "HU0155", "ZB9001", "ZP0777", "AZ0001"}
    r1 = rows["HU0021"]
    assert r1["code"] == "hufoxpocso"
    assert r1["mo_open"] == "08:00" and r1["mo_close"] == "20:00"  # zfill '8:00'
    assert r1["we_open"] == "08:00"  # '08:00 - 20:00' whitespace stripped
    assert r1["su_open"] is None and r1["nonstop"] is None
    r2 = rows["HU0155"]
    assert r2["nonstop"] is True  # 'kültéri' in description
    assert r2["mo_open"] is None  # day block skipped entirely
    assert r2["lat"] == 47.4756 and r2["lon"] == 19.047  # swapped feed coords
    r3 = rows["ZB9001"]
    assert r3["code"] == "hupackecso"  # mixed-case variant upper()d
    assert r3["nonstop"] is None and r3["mo_open"] is None  # falsy description
    r4 = rows["ZP0777"]
    assert r4["street"] == "Király utca"  # waxeye 'u.' → 'utca'
    assert r4["fr_open"] == "006:30"  # zfill(5) no-op for >5 chars
    r5 = rows["AZ0001"]
    assert r5["code"] is None  # unknown variant emits with NULL code
    assert r5["postcode"] is None and r5["city"] is None  # zip/city fields dead
    assert r5["housenumber"] == "20"  # extract_all_address fallback quirk


def test_mobiliti_provider_mapping(spark):
    """hu_mobiliti_ev.py:49-140: evses fold (quantity accumulation,
    last-port-wins output/current/voltage, TESLA ports ignored), per-record
    drops, and the guarded-setter cross-record leak — counts/currents/
    voltages survive a dropped record and counts keep SUMMING across it,
    while *_output strings reset per record."""
    from osm_poi_matchmaker_spark.sources.providers import mobiliti_chargers

    rows = {
        r["ref"]: r
        for r in mobiliti_chargers(
            spark, os.path.join(FIX, "mobiliti_ev.json")
        ).collect()
    }
    # HU-MOB-002 (NULL plugType), -004 (NULL evses), -006 (NULL power),
    # -009 (NULL quantity onto non-None count) drop
    assert set(rows) == {
        "HU-MOB-001", "12345", "HU-MOB-005", "HU-MOB-007", "HU-MOB-008",
        "HU-MOB-010",
    }
    r1 = rows["HU-MOB-001"]
    assert r1["socket_type2_cable"] == 3  # 2 + 1 accumulated
    assert r1["socket_type2_cable_output"] == "11 kW"  # last port wins
    assert r1["socket_type2_cable_voltage"] == 230
    assert r1["socket_chademo"] == 1
    assert r1["socket_type2_combo"] is None  # TESLA port ignored
    assert r1["street"] == "1013 Budapest, Krisztina körút"  # full-addr quirk
    assert r1["housenumber"] == "37/A"
    r3 = rows["12345"]  # numeric feed id stringified
    assert r3["socket_type2_combo"] == 2  # leaked from dropped HU-MOB-002
    assert r3["socket_type2_combo_output"] is None  # outputs DO reset
    assert r3["socket_type2_combo_current"] == 200  # currents leak
    assert r3["socket_type2_combo_voltage"] == 920
    assert r3["manufacturer"] is None
    assert rows["HU-MOB-005"]["lat"] == 47.5289  # swapped coords fixed
    # chademo count leaked 3 from dropped HU-MOB-006 then summed with 2
    assert rows["HU-MOB-007"]["socket_chademo"] == 5
    r8 = rows["HU-MOB-008"]
    # NULL quantity on a None count: count never set, but out/cur/volt are
    assert r8["socket_chademo"] is None
    assert r8["socket_chademo_output"] == "100 kW"
    r10 = rows["HU-MOB-010"]  # empty evses, inherits dropped -009's state
    assert r10["socket_type2_cable"] == 2
    assert r10["socket_type2_cable_output"] is None
    assert r10["socket_type2_cable_current"] == 32


def test_shell_provider_mapping(spark):
    """hu_shell.py:50-113: HU filter, capitalize-all-but-last-two street
    rewrite, city fallback to name, empty-field defaults, amenity booleans
    (set-True-or-NULL), unconditional fuel_* family, row drops."""
    from osm_poi_matchmaker_spark.sources.providers import shell_stations

    rows = {
        r["original"]: r
        for r in shell_stations(spark, os.path.join(FIX, "shell.json")).collect()
    }
    # AT station filtered; missing amenities and missing address drop
    assert set(rows) == {
        "KISKŐRÖSI ÚT 4.", "BUDAPESTI ÚT 154.", "M1 AUTÓPÁLYA", "FŐ ÚT 1.",
    }
    r1 = rows["KISKŐRÖSI ÚT 4."]
    assert r1["street"] == "Kiskőrösi út"  # lower → cap all but last two
    assert r1["nonstop"] is True and r1["public_holiday_open"] is True
    assert r1["fuel_adblue"] is True and r1["truck"] is True
    r3 = rows["FŐ ÚT 1."]
    assert r3["city"] == "Hegyeshalom"  # empty city falls back to name
    assert r3["website"] == "https://shell.hu/"  # empty url default
    assert r3["postcode"] is None and r3["phone"] is None
    assert r3["nonstop"] is None  # empty amenities: never set to False
    assert r3["fuel_octane_95"] is True  # unconditional fuel family
    r5 = rows["M1 AUTÓPÁLYA"]
    assert r5["street"] == "m1 autópálya"  # 2 tokens: nothing capitalized
    assert r5["housenumber"] is None and r5["food"] is True
    # double space collapsed by the clean_string original setter
    assert rows["BUDAPESTI ÚT 154."]["street"] == "Budapesti út"


def test_fire_station_provider_mapping(spark):
    """hu_fire_station.py:94-160: script-marker scan + greedy single-line
    array regex, category→code map, NULL-name drops for categories 1/2/3
    with the code leaking into following unmapped-category records, the
    ==-not-= dead name assignment, waxeye address split."""
    from osm_poi_matchmaker_spark.sources.providers import fire_stations

    html = open(os.path.join(FIX, "fire_station.html"), encoding="utf-8").read()
    pages = spark.createDataFrame([(html,)], ["html"])
    rows = {r["original"]: r for r in fire_stations(pages).collect()}
    # the category-3 record with NULL name drops
    assert "9200 Mosonmagyaróvár, Alkotmány utca 1." not in rows
    assert len(rows) == 5
    assert rows["9021 Győr, Munkácsy Mihály utca 4."]["code"] == "hufiremsta"
    # category '4' inherits the dropped record's hufireusta code (leak)
    assert rows["1081 Budapest, Dologház utca 1."]["code"] == "hufireusta"
    assert rows["9090 Pannonhalma, Dózsa György utca 1."]["code"] == "hufirelsta"
    # unknown category after an added record: clear_all ran → NULL code
    assert rows["3525 Miskolc, Dózsa György út 15."]["code"] is None
    # category '5' never touches the NULL name → kept
    r5 = rows["8500 Pápa, Fő utca 12."]
    assert r5["code"] == "hufirevsta" and r5["city"] == "Pápa"
    assert r5["street"] == "Fő utca" and r5["housenumber"] == "12"
    # "name" is never a column: the reference's == comparison stores nothing
    assert "name" not in fire_stations(pages).columns


def test_mkb_provider_mapping(spark):
    """hu_mkb_bank.py:62-156: bank/ATM code split with inverted defaults,
    pandas-NaN 'nan' day literals, whitespace-only cell → NULL, phone
    extracted from the description, decimal-comma coords, drops."""
    from osm_poi_matchmaker_spark.sources.providers import mkb_banks

    rows = {
        r["ref"]: r
        for r in mkb_banks(spark, os.path.join(FIX, "mkb_bank.tsv")).collect()
    }
    # F003 (missing latitude) and A102 (empty Megjegyzés) drop
    assert set(rows) == {"F001", "A101", "F002"}
    b1 = rows["F001"]
    assert b1["code"] == "humkbbank"
    assert b1["public_holiday_open"] is False and b1["nonstop"] is False
    assert b1["phone"] == "+36 1 268 7066"  # extracted from description
    assert b1["description"].startswith("Akadálymentesen megközelíthető.; ")
    assert b1["website"] == "https://www.mkb.hu/idopont"  # // collapsed
    assert b1["sa_open"] == "nan"  # empty cell = pandas NaN → 'nan' literal
    a1 = rows["A101"]
    assert a1["code"] == "humkbatm"
    assert a1["public_holiday_open"] is True and a1["nonstop"] is True
    assert a1["city"] == "szeged"  # raw clean_string, NOT clean_city
    assert a1["mo_open"] is None  # ATM path never touches the day block
    b2 = rows["F002"]
    assert b2["mo_open"] == "7:30"  # raw strip, no zfill
    assert b2["mo_close"] == "nan"
    assert b2["fr_close"] is None  # whitespace-only cell is the one NULL
    assert b2["phone"] == "+36 62 565 758"  # 06-prefix rewritten to +36


def test_mav_provider_mapping(spark):
    """hu_mav.py:55-106: provider layer over GTFS stops — name strip via
    clean_string, boundary-fixed lat/lon while `original` keeps the raw
    pre-fix coordinate order and Python float rendering."""
    from osm_poi_matchmaker_spark.sources.providers import mav_stations

    rows = {
        r["poi_additional_ref"]: r
        for r in mav_stations(spark, os.path.join(FIX, "mav_gtfs.zip")).collect()
    }
    assert set(rows) == {"S1", "S2", "S3", "S4"}
    s3 = rows["S3"]
    assert s3["lat"] == 47.5007 and s3["lon"] == 19.084  # fixed
    assert s3["original"] == "id=S3 lat=19.084 lon=47.5007 name=Keleti pályaudvar"
    s4 = rows["S4"]
    assert s4["name"] == "Győr"  # clean_string
    assert s4["original"].endswith("name= Győr")  # raw pad collapsed mid-string


def test_gls_provider_mapping(spark):
    """hu_gls.py:75-133: branch chain with setter re-reads and drop-on-None
    intermediates, email through the phone cleaner (bug), dead description
    branch, locker/shop split, location-array and hours drops."""
    from osm_poi_matchmaker_spark.sources.providers import gls_points

    rows = {
        r["ref"]: r
        for r in gls_points(spark, os.path.join(FIX, "gls.json")).collect()
    }
    # GLS-0000 (NULL hours), GLS-3003 (branch chain empties), GLS-4004
    # (NULL name), GLS-6006 (NULL location) all drop
    assert set(rows) == {"GLS-1001", "GLS-2002", "GLS-5005"}
    g1 = rows["GLS-1001"]
    assert g1["branch"] == "Tesco Fogarasi"  # 'GLS Automata' prefix + '|' tail
    assert g1["name"] is None  # lockers never set name
    assert g1["email"] is None  # e-mail through clean_phone_to_str → NULL
    assert g1["description"] == "Bevásárlóközpont földszint"  # dead else
    assert g1["sa_open"] == "09:00" and g1["we_open"] is None
    g2 = rows["GLS-2002"]
    assert g2["branch"] == "Csomagpont Rossmann"  # parens + payment note cut
    assert g2["name"] == "Csomagpont Rossmann"  # shop: name = branch
    assert g2["public_holiday_open"] is False
    assert g2["su_open"] == "08:00"  # day key '7' → Sunday
    g5 = rows["GLS-5005"]
    assert g5["code"] is None and g5["public_holiday_open"] is None  # unknown


def test_mol_provider_mapping(spark):
    """hu_mol.py:80-131: ' Sziget ' waterway check, Fresh-Corner-only
    classification, explicit True/False booleans, dead pho=True."""
    from osm_poi_matchmaker_spark.sources.providers import mol_stations

    rows = {
        r["postcode"]: r
        for r in mol_stations(spark, os.path.join(FIX, "mol.json")).collect()
    }
    # NULL name, NULL services, NULL gpsPosition all drop
    assert set(rows) == {"1061", "1031", "9022", "9222"}
    assert rows["1031"]["code"] == "humolwfu"  # ' Sziget ' with spaces
    assert rows["1061"]["code"] == "humolfu"  # FRESH_CORNER but SHOP present
    assert rows["9022"]["code"] == "humolfaf"  # Fresh-Corner-only
    assert rows["9222"]["code"] == "humolfu"  # TOLL_TERMINAL excludes faf
    r1 = rows["1061"]
    assert r1["truck"] is True and r1["rent_lpg_bottles"] is False  # explicit
    assert r1["public_holiday_open"] is False  # the :107 True is dead
    assert rows["1031"]["city"] == "Budapest"  # clean_city titles 'budapest'


def test_kh_provider_mapping(spark):
    """hu_kh_bank.py:55-90: dynamic-first-key payloads, the guarded
    address block, bank/ATM name variants, all-or-nothing abort."""
    from osm_poi_matchmaker_spark.sources.providers import kh_bank_pois

    bank = kh_bank_pois(spark, os.path.join(FIX, "kh_bank.json"), "K&H Bank")
    rows = sorted(bank.collect(), key=lambda r: (r["lat"]))
    assert len(rows) == 4
    assert all(r["code"] == "hukhbank" for r in rows)
    assert all(r["nonstop"] is False for r in rows)
    blank = [r for r in rows if r["original"] is None]
    assert len(blank) == 1  # '  ' address: guard leaves every field NULL
    assert blank[0]["phone"] == "+36 52 123 456"  # ...but phone still set
    swapped = [r for r in rows if r["lat"] == 47.5316][0]
    assert swapped["lon"] == 19.0624  # boundary fix
    atm = kh_bank_pois(spark, os.path.join(FIX, "kh_bank.json"), "K&H Bank ATM")
    a = atm.limit(1).collect()[0]
    assert a["code"] == "hukhatm" and a["nonstop"] is True
    assert a["public_holiday_open"] is True
    other = kh_bank_pois(spark, os.path.join(FIX, "kh_bank.json"), "Ismeretlen")
    o = other.limit(1).collect()[0]
    assert o["code"] is None and o["nonstop"] is False  # == 'hukhatm' else
    # a record missing 'latitude' aborts the WHOLE feed (no per-record try)
    bad = kh_bank_pois(spark, os.path.join(FIX, "kh_bank_bad.json"))
    assert bad.count() == 0


def test_aldi_provider_mapping(spark):
    """hu_aldi.py:54-98: dayIdx probe with the Sunday mi-=7 fold and
    first-match-wins break, raw city, clean_string phone, drops."""
    from osm_poi_matchmaker_spark.sources.providers import aldi_stores

    rows = {
        r["postcode"]: r
        for r in aldi_stores(spark, os.path.join(FIX, "aldi.json")).collect()
    }
    # AT store filtered; NULL openUntilSorted / NULL openingHours drop
    assert set(rows) == {"2040", "6724"}
    r1 = rows["2040"]
    assert r1["city"] == "budaörs"  # raw clean_string, NOT clean_city
    assert r1["su_open"] == "08:00"  # dayIdx 0 = Sunday (mi -= 7 fold)
    r2 = rows["6724"]
    assert r2["lat"] == 46.2548  # swapped feed coords fixed
    assert r2["mo_open"] == "07:00"  # FIRST dayIdx-1 entry wins (break)
    assert r2["su_open"] == "09:00"  # first dayIdx-0 entry wins
    assert r2["tu_open"] is None


def test_dm_provider_mapping(spark):
    """hu_dm.py:50-97: strip/upper country check, title()d street split,
    website format quirks, the abort-vs-drop hours fold."""
    from osm_poi_matchmaker_spark.sources.providers import dm_stores

    rows = {
        r["ref"]: r
        for r in dm_stores(spark, os.path.join(FIX, "dm.json")).collect()
    }
    # AT skipped; NULL localeCountry, NULL storeNumber, and the record
    # with a NULL timeRanges entry (D789) all drop
    assert set(rows) == {"D123", "D456", "D321"}
    d1 = rows["D123"]
    assert d1["street"] == "Deák Ferenc utca"  # split(',')[0].title() → b2
    # clean_string strips the path's leading slash → broken URL, faithfully
    assert d1["website"] == "https://www.dm.huuzletek/budapest-deak"
    assert d1["su_open"] == "09:00"  # weekDay 9 entry skipped, 7 processed
    d2 = rows["D456"]
    assert d2["mo_open"] == "07:00"
    assert d2["fr_open"] is None  # empty timeRanges ABORTS the loop...
    assert d2["ref"] == "D456"  # ...but the record is still added
    d4 = rows["D321"]
    assert d4["website"] == "https://www.dm.huNone"  # str.format(None)
    assert d4["mo_open"] == "08:30"  # last same-day entry wins (no break)


def test_penny_pepco_obi_provider_mapping(spark):
    """Batch: hu_penny_market.py:52-82 (split-title street, None-segment
    drop), hu_pepco.py:52-103 (admin-city semi-join gate, dead day probe,
    openingHours-presence drop), hu_obi.py:47-78 (zip strip drop,
    guarded phone/website)."""
    from osm_poi_matchmaker_spark.sources.providers import (
        obi_stores,
        penny_stores,
        pepco_stores,
    )

    penny = {
        r["ref"]: r
        for r in penny_stores(spark, os.path.join(FIX, "penny.json")).collect()
    }
    assert set(penny) == {"P101", "P102"}  # empty-segment + NULL street drop
    assert penny["P101"]["street"] == "Sugár út"  # split(',')[0].title()
    assert penny["P102"]["lat"] == 47.4839  # swapped coords fixed

    dim = spark.createDataFrame([("Budapest",), ("Szeged",)], ["name"])
    pepco = {
        r["postcode"]: r
        for r in pepco_stores(
            spark, os.path.join(FIX, "pepco.json"), dim
        ).collect()
    }
    # Wien (not in dim), empty city, NULL openingHours, NULL coords drop
    assert set(pepco) == {"1039", "6722"}
    # without the dim the existence check degrades to keep-all-non-empty
    assert pepco_stores(spark, os.path.join(FIX, "pepco.json")).count() == 3

    obi = {
        r["ref"]: r
        for r in obi_stores(spark, os.path.join(FIX, "obi.json")).collect()
    }
    assert set(obi) == {"OBI-015", "OBI-021"}  # NULL zip drops
    assert obi["OBI-015"]["website"] == "https://www.obi.hu/aruhaz/lurdy"
    assert obi["OBI-021"]["phone"] is None  # '' phone guarded


def test_ofotert_oil_omv_kulcs_provider_mapping(spark):
    """Batch: hu_ofotert.py:54-87 (inner-try day abort keeping prior days),
    hu_oil.py:51-81 (the list-through-clean_string branch bug → literal
    apostrophe), hu_omv.py:57-98 (single range fan-out, 00:00-24:00 →
    nonstop flip), hu_kulcs_patika.py:49-79 (feed truncation at the first
    NULL poi, name-vs-branch split)."""
    from osm_poi_matchmaker_spark.sources.providers import (
        kulcs_patika_stores,
        ofotert_stores,
        oil_stations,
        omv_stations,
    )

    ofo = {
        r["ref"]: r
        for r in ofotert_stores(spark, os.path.join(FIX, "ofotert.json")).collect()
    }
    assert ofo["OF-001"]["mo_open"] == "09:00"  # '9:00 - 17:30' zfilled
    assert ofo["OF-001"]["sa_open"] is None  # 'zárva': no range → (None,None)
    assert ofo["OF-002"]["we_open"] is None  # short array: IndexError abort
    assert ofo["OF-002"]["tu_open"] == "08:00"  # ...prior days kept
    assert ofo["OF-003"]["mo_open"] is None  # NULL array: abort at i=0
    assert ofo["OF-003"]["ref"] == "OF-003"  # ...record still added

    oil = {
        r["ref"]: r
        for r in oil_stations(spark, os.path.join(FIX, "oil.json")).collect()
    }
    assert set(oil) == {"OIL-07", "OIL-12"}  # NULL store / NULL id drop
    assert all(r["branch"] == "'" for r in oil.values())  # the repr[1] bug
    assert oil["OIL-07"]["website"] == "https://www.oil-benzinkutak.hu/kut/07"
    assert oil["OIL-12"]["website"] == "https://www.oil-benzinkutak.hu"

    omv = {
        r["postcode"]: r
        for r in omv_stations(spark, os.path.join(FIX, "omv.json")).collect()
    }
    assert omv["1113"]["nonstop"] is True  # 00:00-24:00 flip
    assert omv["1113"]["mo_open"] is None  # ...days NULLed
    assert omv["9027"]["su_close"] == "22:00"  # one range fans to 7 days
    assert omv["6725"]["public_holiday_open"] is False  # NULL hours branch

    kp = kulcs_patika_stores(spark, os.path.join(FIX, "kulcs_patika.json"))
    rows = {(r["name"], r["branch"]): r for r in kp.collect()}
    # "poi": null only drops ITS record (inner try catches None.get,
    # hu_kulcs_patika.py:61) so 'Elveszett' survives; a literal null
    # list element raises at poi_data.get OUTSIDE the try → outer
    # except aborts the loop, losing 'Utolsó'. NULL patika drops its
    # own record ('in None' TypeError).
    assert set(rows) == {
        (None, "Kulcs patika Teréz"),
        ("Arany Kígyó Gyógyszertár", None),
        (None, "Kulcs patika Elveszett"),
    }


def test_deichmann_yves_benu_easybox_provider_mapping(spark):
    """Batch: hu_deichmann.py:58-99 (clean_street raw street, top-level
    original key, double-try day abort), hu_yves_rocher.py:52-90 (dead
    day probe, phone;mobile chain), hu_benu.py:51-90 (anchored URL match,
    extract_all/better_2 split), hu_easybox.py:53-79 (countryId filter)."""
    from osm_poi_matchmaker_spark.sources.providers import (
        benu_stores,
        deichmann_stores,
        easybox_lockers,
        yves_rocher_stores,
    )

    dei = {
        r["ref"]: r
        for r in deichmann_stores(
            spark, os.path.join(FIX, "deichmann.json")
        ).collect()
    }
    assert dei["D-1052"]["street"] == "Fő utca"  # clean_street, no better_2
    assert dei["D-1052"]["original"] == "Váci utca 11."  # top-level key
    assert dei["D-1052"]["su_open"] is None  # NULL formattedHour day 7 set
    assert dei["D-1052"]["sa_close"] == "14:00"
    assert dei["D-6722"]["tu_open"] is None  # NULL closingTime aborts day 2
    assert dei["D-6722"]["mo_open"] == "10:00"  # ...prior day kept
    assert dei["D-9021"]["mo_open"] is None  # NULL openingHours: no days

    yv = {
        r["postcode"]: r
        for r in yves_rocher_stores(
            spark, os.path.join(FIX, "yves_rocher.json")
        ).collect()
    }
    assert set(yv) == {"1052", "6722", "9021"}  # NULL hours drops
    assert yv["1052"]["phone"] == "+36 1 266 5533;+36 30 123 4567"
    assert yv["6722"]["phone"] == "+36 70 765 4321"  # mobile alone
    assert yv["9021"]["phone"] == "+36 96 311 222"  # phone alone

    benu = {
        r["postcode"]: r
        for r in benu_stores(spark, os.path.join(FIX, "benu.json")).collect()
    }
    assert set(benu) == {"1052", "6722"}  # NULL name drops
    b1 = benu["1052"]
    assert b1["branch"] == "BENU Gyógyszertár Budapest Oktogon"
    assert b1["website"] == "https://benu.hu/gyogyszertar/oktogon"
    assert b1["street"] == "Andrássy út"  # address_street overwrites
    b2_ = benu["6722"]
    assert b2_["name"] == "Szent Margit Gyógyszertár"
    assert b2_["website"] is None  # mid-text URL: .match is start-anchored
    assert b2_["city"] == "Szeged"  # extract_all_address over full address

    eb = {
        r["ref"]: r
        for r in easybox_lockers(spark, os.path.join(FIX, "easybox.json")).collect()
    }
    assert set(eb) == {"EB-1001", "EB-1002"}  # RO locker filtered
    assert eb["EB-1002"]["lat"] == 46.253  # swapped coords fixed


def test_sber_nemzeti_cib_magnet_provider_mapping(spark):
    """Batch: hu_sber_bank.py:53-121 (two-stream doc, kerület→county,
    'None 12' composite, day-entry quirks), hu_nemzetidohanybolt.py:40-55
    (no per-record try → key-missing truncation), hu_cib_bank.py:57-95
    (IN_SERVICE + name variants), hu_magnet_bank.py:55-85 (all-NULL rows
    for NULL addresses)."""
    from osm_poi_matchmaker_spark.sources.providers import (
        cib_bank_pois,
        magnet_bank_pois,
        nemzeti_dohanybolt_stores,
        sber_bank_pois,
    )

    sber = sber_bank_pois(spark, os.path.join(FIX, "sber.json")).collect()
    by_pc = {r["postcode"]: r for r in sber}
    assert len(sber) == 3  # NULL houseNumber atm + NULL openTime branch drop
    assert by_pc["1062"]["city"] == "Budapest"  # 'kerület' → county
    assert by_pc["6722"]["original"] == "None 12"  # str.format(None) quirk
    assert by_pc["6722"]["street"] is None  # better_2 rejects 'None 12'
    b = by_pc["9022"]
    assert b["we_open"] is None  # '' → None
    assert b["th_open"] is None  # NULL entry skipped
    assert b["fr_open"] == "08:00" and b["sa_open"] is None  # 5-entry list

    nz = nemzeti_dohanybolt_stores(spark, os.path.join(FIX, "nemzeti.json"))
    rows = {r["city"]: r for r in nz.collect()}
    # record 3 misses the 'lat' KEY → truncation: Pécs (after it) is lost
    assert set(rows) == {"Budapest", "Szeged"}
    assert rows["Szeged"]["postcode"] is None  # missing VALUE: kept, NULL

    cib = cib_bank_pois(spark, os.path.join(FIX, "cib.json"), "CIB Bank")
    crows = {r["postcode"]: r for r in cib.collect()}
    assert set(crows) == {"1062", "9022"}  # CLOSED + NULL location drop
    assert crows["9022"]["street"] == "Medve utca"  # clean_street 'u.'
    atm = cib_bank_pois(spark, os.path.join(FIX, "cib.json"), "CIB Bank ATM")
    assert atm.limit(1).collect()[0]["code"] == "hucibatm"

    mag = magnet_bank_pois(spark, os.path.join(FIX, "magnet.json")).collect()
    assert len(mag) == 4  # the NULL-address record still emits
    null_row = [r for r in mag if r["original"] is None]
    assert len(null_row) == 1 and null_row[0]["code"] is None  # all-NULL row
    bank = [r for r in mag if r["code"] == "humagnbank"][0]
    assert bank["phone"] == "+36 1 428 8888"  # hardcoded
    unknown = [r for r in mag if r["original"] and "Szeged" in r["original"]][0]
    assert unknown["code"] is None  # type '7' keeps NULL after clear_all


def test_avia_mobil_petrol_provider_mapping(spark):
    """Batch: hu_avia.py:50-100 (use_replace JS extraction, title city
    with waxeye overwrite, '1'-flag family), hu_mobil_petrol.py:49-98
    (the locals() range leak across records, nonstop flip, drops)."""
    from osm_poi_matchmaker_spark.sources.providers import (
        avia_stations,
        mobil_petrol_stations,
    )

    pages = spark.createDataFrame(
        [(open(os.path.join(FIX, "avia.html"), encoding="utf-8").read(),)],
        ["html"],
    )
    avia = {r["city"]: r for r in avia_stations(pages).collect()}
    a1 = avia["Budapest"]
    assert a1["website"] == "/toltoallomas/?id=A101"
    assert a1["fuel_octane_95"] is True  # b95g='0' but b95='1'
    assert a1["fuel_diesel"] is True  # gdies='1'
    a2 = avia["Szeged kút"]  # empty cim: raw title stays the city
    assert a2["street"] is None and a2["ref"] is None  # '' kutid → None
    assert a2["fuel_octane_95"] is False  # explicit False family

    pages2 = spark.createDataFrame(
        [(open(os.path.join(FIX, "mobil_petrol.html"), encoding="utf-8").read(),)],
        ["html"],
    )
    mp = {r["city"]: r for r in mobil_petrol_stations(pages2).collect()}
    # NULL location (Sehol) and NULL services (Miskolc) drop
    assert set(mp) == {"Budapest", "Szeged", "Győr", "Pécs"}
    assert mp["Szeged"]["nonstop"] is True  # '0-24'
    assert mp["Szeged"]["mo_open"] is None
    assert mp["Budapest"]["mo_open"] == "06:00"  # own 6-22 match
    # the locals() leak: 'shop'-only Győr inherits Budapest's range
    assert mp["Győr"]["mo_open"] == "06:00"
    assert mp["Pécs"]["mo_open"] == "05:00"  # own 5-22 match


def test_ccc_jysk_tom_provider_mapping(spark):
    """Batch: hu_ccc.py:62-87 (div-text JSON, housenumber overwrite),
    hu_jysk.py:48-80 (react-props attribute JSON + per-store detail
    join), hu_tom_market.py:45-82 (company-suffix skip)."""
    from osm_poi_matchmaker_spark.sources.providers import (
        ccc_stores,
        jysk_stores,
        tom_market_stores,
    )

    pages = spark.createDataFrame(
        [(open(os.path.join(FIX, "ccc.html"), encoding="utf-8").read(),)],
        ["html"],
    )
    ccc = {r["postcode"]: r for r in ccc_stores(pages).collect()}
    assert set(ccc) == {"1052", "6722"}  # NULL house_number drops
    assert ccc["1052"]["housenumber"] == "11"  # '11.' dot-stripped
    assert ccc["6722"]["housenumber"] == "5/B"  # better_2 overwritten

    idx = spark.createDataFrame(
        [(open(os.path.join(FIX, "jysk_index.html"), encoding="utf-8").read(),)],
        ["html"],
    )
    det = spark.createDataFrame(
        [
            ("J001", open(os.path.join(FIX, "jysk_j001.html"), encoding="utf-8").read()),
            ("J002", open(os.path.join(FIX, "jysk_j002.html"), encoding="utf-8").read()),
        ],
        ["ref", "html"],
    )
    jysk = {r["ref"]: r for r in jysk_stores(idx, det).collect()}
    assert set(jysk) == {"J001", "J002"}  # J003: missing detail page drops
    assert jysk["J001"]["street"] == "Budafoki utca"  # clean_street 'u.'
    assert jysk["J002"]["branch"] == "JYSK Szeged üzletház"  # clean_branch
    assert jysk["J002"]["city"] == "Szeged"  # clean_city titles

    tom = tom_market_stores(spark, os.path.join(FIX, "tom_market.json"))
    rows = {r["postcode"]: r for r in tom.collect()}
    # ' kft.' and ' bt' suffixed names skip their records entirely
    assert set(rows) == {"1072", "9021"}
    assert rows["9021"]["branch"] is None  # empty name: kept, NULL branch


def test_rossmann_pingvin_bubi_plugee_volanbusz_provider_mapping(spark):
    """Final batch: hu_rossmann.py:53-95 (Next.js JSON script, 7-line
    openings, both-or-nothing days), hu_pingvin_patika.py:58-88 (last-p
    description, misplaced-parser default), hu_mol_bubi.py:51-104
    (dash-split name fields), hu_mol_plugee_ev.py:50-92 (semicolon CSV,
    NaN-coordinate keep), hu_volanbusz ≡ hu_mav."""
    from osm_poi_matchmaker_spark.sources.providers import (
        mol_bubi_docks,
        mol_plugee_chargers,
        pingvin_patika_stores,
        rossmann_stores,
        volanbusz_stops,
    )

    pages = spark.createDataFrame(
        [(open(os.path.join(FIX, "rossmann.html"), encoding="utf-8").read(),)],
        ["html"],
    )
    ross = {r["postcode"]: r for r in rossmann_stores(pages).collect()}
    assert set(ross) == {"1052", "6722"}  # 2-line openings drops Győr
    assert ross["1052"]["sa_open"] == "09:00"
    assert ross["1052"]["su_open"] is None  # 'zárva': both-or-nothing
    assert ross["6722"]["mo_open"] is None  # NULL openings: kept, NULL days

    p2 = spark.createDataFrame(
        [(open(os.path.join(FIX, "pingvin.html"), encoding="utf-8").read(),)],
        ["html"],
    )
    ping = {r["city"]: r for r in pingvin_patika_stores(p2).collect()}
    assert ping["Szeged"]["description"] == "Ügyelet: hétvégén zárva"  # last <p>
    assert ping["Budapest"]["description"] is None  # NULL content: no <p>

    bubi = {
        r["ref"]: r
        for r in mol_bubi_docks(spark, os.path.join(FIX, "mol_bubi.json")).collect()
    }
    b = bubi["0201"]
    assert b["branch"] == "Széll Kálmán tér" and b["description"] == "észak"
    assert bubi["0512"]["description"] is None  # 2 parts: split[2] IndexError
    # branch goes through the SETTER's clean_branch ('U.' → 'utca',
    # poi_dataset.py:220), not bare clean_string
    assert bubi["0999"]["branch"] == "Hősök utca észak"
    assert bubi["Karakterek nélkül"]["branch"] is None  # 1 part
    assert bubi[None]["ref"] is None  # NULL name: record kept

    plg = {
        r["ref"]: r
        for r in mol_plugee_chargers(
            spark, os.path.join(FIX, "mol_plugee.csv")
        ).collect()
    }
    assert plg["PL-001"]["socket_chademo"] == 1
    assert plg["PL-001"]["socket_type2_cable"] is None  # empty cells unset
    assert plg["PL-002"]["lat"] is None  # NaN coords: row kept, NULL coords
    assert plg["PL-002"]["capacity"] == 4

    vb = volanbusz_stops(spark, os.path.join(FIX, "mav_gtfs.zip"))
    assert {r["code"] for r in vb.collect()} == {"huvolantra"}
