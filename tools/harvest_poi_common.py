"""Harvest the per-provider ``types()`` brand metadata into a JSONL dim.

Every reference dataprovider ships static ``poi_common`` rows from its
``types()`` method (e.g. ``dataproviders/hu_tesco.py:62-81``): poi_code,
brand tags merged from the payment tag sets in
``libs/osm_tag_sets.py:1-17``, search/avoid regexes, and the three
per-brand OSM search distances. Those rows land in the ``poi_common``
table (``dao/data_structure.py:318-340``) via ``insert_type`` →
``get_or_create_common`` (``dao/data_handlers.py:857,401``), which is
first-insert-wins on poi_code in the config's module-enable order
(``app.conf-template:38`` — hu_posta runs before hu_posta_json, so the
five duplicated ``huposta*`` codes resolve to hu_posta's rows).

This script regenerates
``osm_poi_matchmaker_spark/resources/poi_common.jsonl`` from the
read-only reference checkout. It imports each dataprovider module with
every ``osm_poi_matchmaker.*`` / bs4 / lxml dependency stubbed EXCEPT
``libs.osm_tag_sets`` (pure data, loaded for real), instantiates the
provider class without its DB machinery, and calls ``contains()`` +
``types()``. The output is DATA parity (the brand metadata itself),
not code: all executable logic here is new.

Run:  python3 tools/harvest_poi_common.py  (writes the JSONL in place)

Resource row shape (one JSON object per line, column defaults from
``dao/data_structure.py:330-337`` applied):
  provider, seq (module-enable order; unlisted modules follow
  alphabetically after the list), poi_code, poi_common_name, poi_type,
  poi_tags (canonical JSON string, sorted keys), poi_url_base,
  poi_search_name, poi_search_avoid_name, preserve_original_name,
  preserve_original_post_code, export_poi_name, do_not_export_addr_tags,
  osm_search_distance_perfect/safe/unsafe, additional_ref_name
"""

from __future__ import annotations

import enum
import glob
import importlib.util
import inspect
import json
import os
import sys
import types as pytypes

REF = "/root/reference/osm_poi_matchmaker"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "osm_poi_matchmaker_spark",
    "resources",
    "poi_common.jsonl",
)

# app.conf-template:38 — dataproviders.modules.enable (first-insert-wins
# order for duplicate poi_codes; hu_posta before hu_posta_json)
ENABLE_ORDER = [
    "hu_posta", "hu_aldi", "hu_avia", "hu_benu", "hu_cba", "hu_ccc",
    "hu_cib_bank", "hu_deichmann", "hu_dm", "hu_easybox",
    "hu_fire_station", "hu_foxpost", "hu_gls", "hu_jysk", "hu_kh_bank",
    "hu_kulcs_patika", "hu_magnet_bank", "hu_mobiliti_ev",
    "hu_mobil_petrol", "hu_mol_bubi", "hu_mol_plugee_ev", "hu_mol",
    "hu_obi", "hu_ofotert", "hu_oil", "hu_omv", "hu_penny_market",
    "hu_pepco", "hu_pingvin_patika", "hu_posta_json", "hu_rossmann",
    "hu_sber_bank", "hu_shell", "hu_spar", "hu_tesco", "hu_tom_market",
    "hu_yves_rocher", "hu_volanbusz",
]

# dao/data_structure.py:330-337 column defaults
DEFAULTS = {
    "poi_search_name": None,
    "poi_search_avoid_name": None,
    "preserve_original_name": False,
    "preserve_original_post_code": False,
    "export_poi_name": True,
    "do_not_export_addr_tags": False,
    "osm_search_distance_perfect": None,
    "osm_search_distance_safe": None,
    "osm_search_distance_unsafe": None,
    "additional_ref_name": None,
    "poi_url_base": None,
    "poi_type": None,
}

COLS = [
    "provider", "seq", "poi_code", "poi_common_name", "poi_type",
    "poi_tags", "poi_url_base", "poi_search_name",
    "poi_search_avoid_name", "preserve_original_name",
    "preserve_original_post_code", "export_poi_name",
    "do_not_export_addr_tags", "osm_search_distance_perfect",
    "osm_search_distance_safe", "osm_search_distance_unsafe",
    "additional_ref_name",
]

# types() resolved dynamically from the AllThePlaces run feed — the
# Spark port builds that dim from the insights fixture instead
# (sources/providers.py alltheplaces_types); hu_generic has no types().
SKIP = {"hu_alltheplaces"}


class _Stub:
    def __init__(self, name: str = "stub"):
        self._name = name

    def __getattr__(self, k):
        return _Stub(f"{self._name}.{k}")

    def __call__(self, *a, **k):
        return _Stub(f"{self._name}()")

    def __str__(self):
        return self._name

    def __fspath__(self):
        return "/tmp/stubcache"


def _mkmod(name: str) -> pytypes.ModuleType:
    m = pytypes.ModuleType(name)
    m.__getattr__ = lambda k, n=name: _Stub(f"{n}.{k}")
    sys.modules[name] = m
    return m


def _install_stub_tree() -> None:
    spec = importlib.util.spec_from_file_location(
        "osm_tag_sets", os.path.join(REF, "libs", "osm_tag_sets.py")
    )
    tag_sets = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tag_sets)

    for pkg in [
        "osm_poi_matchmaker", "osm_poi_matchmaker.libs",
        "osm_poi_matchmaker.utils", "osm_poi_matchmaker.dao",
        "bs4", "lxml",
    ]:
        _mkmod(pkg).__path__ = []
    for sub in [
        "libs.soup", "libs.address", "libs.geo", "libs.osm",
        "libs.poi_dataset", "libs.poi_qc", "libs.online_poi_matching",
        "libs.file_output", "libs.pandas", "libs.waxeye",
        "libs.compare_strings", "libs.gtfs", "libs.xml",
        "dao.data_handlers", "dao.data_structure",
        "dao.poi_array_structure", "utils.data_provider", "utils.enums",
        "utils.config", "utils.timing",
    ]:
        _mkmod(f"osm_poi_matchmaker.{sub}")
    _mkmod("lxml.etree")

    class FileType(enum.Enum):
        json = "json"
        xml = "xml"
        csv = "csv"
        html = "html"
        zip = "zip"
        kml = "kml"
        geojson = "geojson"

    sys.modules["osm_poi_matchmaker.utils.enums"].FileType = FileType

    class DataProvider:
        def __init__(self, *a, **k):
            pass

    sys.modules["osm_poi_matchmaker.utils.data_provider"].DataProvider = (
        DataProvider
    )
    sys.modules["osm_poi_matchmaker.libs.osm_tag_sets"] = tag_sets


def harvest() -> list[dict]:
    _install_stub_tree()
    rows: list[dict] = []
    errors: dict[str, str] = {}
    listed = {m: i for i, m in enumerate(ENABLE_ORDER)}
    unlisted_base = len(ENABLE_ORDER)
    unlisted = sorted(
        os.path.basename(p)[:-3]
        for p in glob.glob(os.path.join(REF, "dataproviders", "hu_*.py"))
        if os.path.basename(p)[:-3] not in listed
    )
    seq_of = dict(listed)
    seq_of.update({m: unlisted_base + i for i, m in enumerate(unlisted)})

    for path in sorted(glob.glob(os.path.join(REF, "dataproviders", "hu_*.py"))):
        modname = os.path.basename(path)[:-3]
        if modname in SKIP:
            continue
        try:
            spec = importlib.util.spec_from_file_location(modname, path)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            cls = getattr(mod, modname, None)
            if cls is None:
                cands = [
                    v
                    for v in vars(mod).values()
                    if isinstance(v, type) and v.__module__ == modname
                ]
                cls = cands[0] if cands else None
            if cls is None or not hasattr(cls, "types"):
                continue
            obj = object.__new__(cls)
            for attr in (
                "tags", "link", "filename", "filetype", "POI_COMMON_TAGS",
                "headers", "post",
            ):
                setattr(obj, attr, None)
            obj.verify_link = True
            obj.download_cache = "/tmp/stubcache"
            try:
                obj.contains()
            except Exception:
                pass
            if obj.tags is None and "__init__" in vars(cls):
                # hu_cib_bank.py:23-35 style: tags live in a custom
                # __init__, not contains()
                sig = inspect.signature(cls.__init__)
                kwargs = {p: None for p in list(sig.parameters)[1:]}
                try:
                    cls.__init__(obj, **kwargs)
                except Exception as e:
                    errors[modname] = f"init: {e!r}"
            for r in obj.types():
                r = dict(r)
                bad = [
                    k
                    for k, v in r.items()
                    if isinstance(v, _Stub)
                    or (
                        isinstance(v, dict)
                        and any(isinstance(x, _Stub) for x in v.values())
                    )
                ]
                if bad:
                    errors[modname] = f"stub values leaked into {bad}"
                    continue
                row = dict(DEFAULTS)
                row.update(r)
                row["poi_tags"] = json.dumps(
                    {str(k): str(v) for k, v in (r.get("poi_tags") or {}).items()},
                    ensure_ascii=False,
                    sort_keys=True,
                    separators=(",", ":"),
                )
                row["provider"] = modname
                row["seq"] = seq_of[modname]
                rows.append({c: row.get(c) for c in COLS})
        except SystemExit as e:
            errors[modname] = f"sys.exit {e}"
        except Exception as e:
            errors[modname] = f"{type(e).__name__}: {e}"

    if errors:
        raise RuntimeError(f"harvest incomplete: {errors}")
    return rows


def main() -> None:
    rows = harvest()
    rows.sort(key=lambda r: (r["seq"], r["poi_code"]))
    with open(OUT, "w", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r, ensure_ascii=False, sort_keys=True) + "\n")
    print(f"wrote {len(rows)} rows from "
          f"{len({r['provider'] for r in rows})} providers to {OUT}")


if __name__ == "__main__":
    main()
