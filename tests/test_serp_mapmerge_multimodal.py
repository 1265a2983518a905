"""SERP parser (M15), MapService merge (J4), multimodal stages."""

import pyarrow as pa
import pytest

from anycrawl_ray.functions.mapmerge import (
    filter_by_domain,
    map_urls,
    merge_url_sources,
    prepare_source,
    source_stats,
)
from anycrawl_ray.functions.serp import (
    effective_pages,
    parse_serp,
    reassemble_pages,
)
from anycrawl_ray.stages.multimodal import (
    FrameSampler,
    MediaFeatureExtractor,
    synth_media_table,
)


def block(url, title, desc, jsc="SC7lYd"):
    return (
        f'<div jscontroller="{jsc}"><a href="{url}"><h3>{title}</h3></a>'
        f'<div data-sncf="1">{desc}</div></div>'
    )


def test_serp_parse_happy_path():
    html = "<html><body>" + block("http://a.test/1", "T1", "D1") + block(
        "http://a.test/2", "T2", "D2"
    ) + "</body></html>"
    r = parse_serp(html)
    assert [x["url"] for x in r] == ["http://a.test/1", "http://a.test/2"]
    assert r[0]["title"] == "T1" and r[0]["description"] == "D1"
    assert r[0]["category"] == "web" and r[0]["source"] == "Google Search Result"


def test_serp_skip_rules():
    # Google.ts:210-228: skip when no a>h3, no href, or no data-sncf content
    html = (
        '<div jscontroller="SC7lYd"><h3>NoAnchor</h3><div data-sncf="1">x</div></div>'
        + block("", "NoUrl", "x")
        + '<div jscontroller="SC7lYd"><a href="http://y"><h3>NoDesc</h3></a></div>'
        + block("http://ok.test", "OK", "desc")
        + block("http://other.test", "WrongController", "d", jsc="other")
    )
    r = parse_serp(html)
    assert [x["url"] for x in r] == ["http://ok.test"]


def test_serp_script_removed_and_nested():
    html = (
        '<div jscontroller="SC7lYd"><a href="http://n.test"><h3>N</h3></a>'
        '<div data-sncf="1">before<script>evil()</script><span>after</span></div></div>'
    )
    r = parse_serp(html)
    assert r[0]["description"] == "beforeafter"


def test_serp_pagination_math():
    # SearchService.ts:219-229
    assert effective_pages(1) == 1
    assert effective_pages(10) == 1
    assert effective_pages(11) == 2
    assert effective_pages(500) == 20  # capped
    pages = [(1, [{"u": "b"}]), (0, [{"u": "a"}])]
    assert [r["u"] for r in reassemble_pages(pages, 2)] == ["a", "b"]


def test_mapmerge_first_writer_wins_with_backfill():
    sitemap = prepare_source(["http://e.test/a", "http://e.test/b"], "sitemap")
    search = prepare_source(
        ["http://e.test/a", "http://e.test/c"], "search",
        titles=["TA", "TC"], descriptions=[None, "DC"],
    )
    merged = merge_url_sources([sitemap, search])
    rows = {r["url"]: r for r in merged.to_pylist()}
    assert rows["http://e.test/a"]["source"] == "sitemap"  # first writer
    assert rows["http://e.test/a"]["title"] == "TA"        # backfilled
    assert rows["http://e.test/c"]["source"] == "search"
    # insertion order: sitemap rows first
    assert merged.column("url").to_pylist()[0] == "http://e.test/a"


def test_mapmerge_fragment_and_scheme_rules():
    s = prepare_source(
        ["http://e.test/a#frag", "http://e.test/a#other", "ftp://no.test/x"],
        "sitemap",
    )
    assert s.column("url").to_pylist() == ["http://e.test/a"]  # dedup + http-only


def test_mapmerge_domain_filter_and_limit():
    t = prepare_source(
        ["http://e.test/a", "http://sub.e.test/b", "http://other.test/c"],
        "sitemap",
    )
    exact = filter_by_domain(t, "http://e.test/", include_subdomains=False)
    assert exact.column("url").to_pylist() == ["http://e.test/a"]
    subs = filter_by_domain(t, "http://e.test/", include_subdomains=True)
    assert subs.column("url").to_pylist() == ["http://e.test/a", "http://sub.e.test/b"]
    out = map_urls([t], "http://e.test/", include_subdomains=True, limit=1)
    assert out.num_rows == 1
    assert source_stats([t]) == {"sitemap": 3}


def test_media_extractor_fake_mode_deterministic():
    media = synth_media_table(32)
    ex = MediaFeatureExtractor(mode="fake")
    out1, out2 = ex(media), ex(media)
    assert out1.num_rows == 32
    assert out1.column("feature").to_pylist() == out2.column("feature").to_pylist()
    assert all(out1.column("decoded_ok").to_pylist())
    assert len(out1.column("feature")[0].as_py()) == 16


def test_media_extractor_strict_raises():
    ex = MediaFeatureExtractor(mode="strict")
    with pytest.raises(NotImplementedError):
        ex(synth_media_table(2))


def test_frame_sampler_flatmap_shape():
    media = synth_media_table(4)
    fs = FrameSampler(every_ms=2000)
    out = fs(media)
    durs = media.column("duration_ms").to_pylist()
    expected = sum(len(range(0, max(d, 1), 2000)) for d in durs)
    assert out.num_rows == expected
    assert out.column("media_ref")[0].as_py().endswith("#frame0")


def test_image_resizer_stage(ray_session):
    import ray.data as rd

    from anycrawl_ray.stages.multimodal import (
        MEDIA_SCHEMA, ImageResizer, synth_media_table,
    )

    media = synth_media_table(64)
    out = (
        rd.from_arrow(media)
        .map_batches(ImageResizer, fn_constructor_kwargs={"max_dim": 256},
                     concurrency=2, batch_size=16, batch_format="pyarrow")
        .to_pandas()
    )
    assert len(out) == 64
    assert (out["width"].max() <= 256) and (out["height"].max() <= 256)
    # aspect ratio preserved within integer rounding
    import numpy as np
    src = media.to_pandas()
    big = src["width"].to_numpy() > 256
    ratio_src = src["width"].to_numpy() / src["height"].to_numpy()
    merged = src.merge(out, on="media_ref", suffixes=("_a", "_b"))
    ratio_out = merged["width_b"].to_numpy() / merged["height_b"].to_numpy()
    ratio_in = merged["width_a"].to_numpy() / merged["height_a"].to_numpy()
    assert np.allclose(ratio_out, ratio_in, rtol=0.15)
    # deterministic payload, schema stable
    out2 = (
        rd.from_arrow(media)
        .map_batches(ImageResizer, fn_constructor_kwargs={"max_dim": 256},
                     concurrency=1, batch_size=64, batch_format="pyarrow")
        .to_pandas()
    )
    a = out.sort_values("media_ref").reset_index(drop=True)
    b = out2.sort_values("media_ref").reset_index(drop=True)
    assert (a["payload"] == b["payload"]).all()

    import pytest as _pytest

    with _pytest.raises(Exception):
        rd.from_arrow(media.slice(0, 4)).map_batches(
            ImageResizer, fn_constructor_kwargs={"mode": "strict"},
            concurrency=1, batch_format="pyarrow",
        ).to_pandas()
