"""§2.10 PipelineStep registry: named registration, hook merge order,
Dataset composition, and crawl-pipeline span-step integration (no-op step
preserves byte parity; transforming step applied per batch)."""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from anycrawl_ray.steps import PipelineStep, StepRegistry


def test_register_get_override_and_names():
    reg = StepRegistry()
    f1 = lambda t: t
    f2 = lambda t: t
    reg.register("a", f1)
    assert reg.get("a").fn_or_cls is f1
    reg.register("a", f2)  # last registration wins (Map.set semantics)
    assert reg.get("a").fn_or_cls is f2
    reg.register("b", f1)
    assert reg.registered_names() == ["a", "b"]
    with pytest.raises(KeyError):
        reg.get("missing")


def test_hook_merge_order_matches_reference():
    # EngineConfigurator.ts:142-147 — new pre-hooks PREPEND
    reg = StepRegistry()
    for n in ("h1", "h2", "core", "p1"):
        reg.register(n, lambda t: t)
    reg.add_pre_hook("h1")
    reg.add_pre_hook("h2")  # prepends before h1
    reg.add_post_hook("p1")
    assert [s.name for s in reg.pipeline(["core"])] == ["h2", "h1", "core", "p1"]


def test_apply_steps_function_and_actor(ray_session):
    import ray.data as rd

    reg = StepRegistry()
    reg.register("double", lambda t: t.set_column(0, "x", pc.multiply(t.column("x"), 2)))

    class AddN:
        def __init__(self, n=0):
            self.n = n

        def __call__(self, t: pa.Table) -> pa.Table:
            return t.set_column(0, "x", pc.add(t.column("x"), self.n))

    reg.register("addn", AddN, kwargs={"n": 5}, concurrency=1)
    ds = rd.from_arrow(pa.table({"x": pa.array(range(10), pa.int64())}))
    out = reg.apply_steps(ds, ["double", "addn"]).to_pandas().sort_values("x")
    assert out["x"].tolist() == [2 * i + 5 for i in range(10)]


def test_crawl_span_steps(ray_session, small_corpus, tmp_path):
    from anycrawl_ray import steps as st
    from anycrawl_ray.pipelines.crawl import CrawlRunConfig, run_crawl
    from anycrawl_ray.refmodel import CrawlOptions

    opts = CrawlOptions(limit=15)
    base_dir = str(tmp_path / "base")
    base = run_crawl("http://h00.example.test/p/0000", opts, small_corpus,
                     CrawlRunConfig(spans_out_dir=base_dir))
    base_t = pq.read_table(base_dir).sort_by("url")

    st.register("noop", lambda t: t)

    class MarkdownUpper:
        def __init__(self):
            pass

        def __call__(self, t: pa.Table) -> pa.Table:
            i = t.column_names.index("markdown")
            return t.set_column(i, "markdown", pc.utf8_upper(t.column("markdown")))

    st.register("md_upper", MarkdownUpper, concurrency=1)
    try:
        # no-op step: byte parity with the baseline run
        noop_dir = str(tmp_path / "noop")
        out = run_crawl("http://h00.example.test/p/0000", opts, small_corpus,
                        CrawlRunConfig(spans_out_dir=noop_dir, span_steps=("noop",)))
        assert out.order == base.order
        assert pq.read_table(noop_dir).sort_by("url").equals(base_t)

        # transforming step: applied to every span batch before the sink
        up_dir = str(tmp_path / "upper")
        out2 = run_crawl("http://h00.example.test/p/0000", opts, small_corpus,
                         CrawlRunConfig(spans_out_dir=up_dir,
                                        span_steps=("noop", "md_upper")))
        assert out2.order == base.order
        up_t = pq.read_table(up_dir).sort_by("url")
        assert up_t.column("markdown").to_pylist() == [
            m.upper() for m in base_t.column("markdown").to_pylist()
        ]
    finally:
        # registry is module-global: clean up for other tests
        st.default_registry._steps.pop("noop", None)
        st.default_registry._steps.pop("md_upper", None)
