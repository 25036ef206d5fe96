from osm_poi_matchmaker_spark.functions.tags import merge_tags


def test_layer_precedence():
    got = merge_tags({"shop": "old", "name": "Live"}, {"shop": "convenience"}, {"name": "X"})
    assert got["shop"] == "convenience"
    assert got["name"] == "X"


def test_contact_rewrite_plain_key():
    got = merge_tags({"phone": "+36 1 234 5678"}, None, None)
    assert got == {"contact:phone": "+36 1 234 5678"}


def test_contact_rewrite_never_overwrites_existing():
    got = merge_tags({"phone": "OLD", "contact:phone": "KEEP"}, None, None)
    assert got == {"contact:phone": "KEEP"}


def test_email_website_lowercased():
    got = merge_tags({"website": "HTTPS://X.HU/A", "email": "A@B.HU"}, None, None)
    assert got["contact:website"] == "https://x.hu/a"
    assert got["contact:email"] == "a@b.hu"


def test_addr_tags_dropped_for_flagged_brands():
    got = merge_tags({"addr:city": "Bp", "name": "X"}, None, None, drop_addr_tags=True)
    assert got == {"name": "X"}


def test_none_values_skipped():
    got = merge_tags({"a": None}, {"b": "1"}, None)
    assert got == {"b": "1"}
