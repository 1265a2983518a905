"""Text-analysis operator unit tests (functions/text.py)."""

import numpy as np
import pyarrow as pa

from anycrawl_ray.functions.text import (
    bpe_token_counts,
    doc_fingerprint,
    language_id,
    quality_scores,
    rolling_kgram_hashes,
    token_counts,
    winnow_fingerprints,
)


def arr(*texts):
    return pa.array(list(texts), pa.string())


def test_token_counts():
    assert token_counts(arr("a b  c", "", "  x ", "one")).tolist() == [3, 0, 1, 1]


def test_bpe_counts_nonzero():
    out = bpe_token_counts(arr("hello, world!", ""))
    assert out[0] >= 3 and out[1] == 0


def test_language_id_profiles():
    texts = arr(
        "the cat is in the house and it is warm",
        "el perro y la casa en un lugar que es grande",
        "der hund und die katze ist nicht mit ein zu",
        "le chien et la maison est dans les champs des",
        "你好世界这是一个测试文档谢谢再见",
        "zzz qqq www",
    )
    assert language_id(texts) == ["en", "es", "de", "fr", "zh", "unknown"]


def test_quality_scores_bounds_and_order():
    good = "the quick brown fox jumps over the lazy dog " * 8
    bad = "1234 5678 90!! @@@@"
    s = quality_scores(arr(good, bad))
    assert 0 <= s[1] < s[0] <= 1


def test_rolling_hash_shift_invariance():
    h1 = rolling_kgram_hashes("abcdefgh", 4)
    h2 = rolling_kgram_hashes("xxabcdefgh", 4)
    # same grams appear regardless of position
    assert set(h1.tolist()) <= set(h2.tolist())


def test_winnowing_subset_and_determinism():
    fps = winnow_fingerprints("the quick brown fox jumps over", 4, 3)
    fps2 = winnow_fingerprints("the quick brown fox jumps over", 4, 3)
    assert (fps == fps2).all()
    all_h = set(rolling_kgram_hashes("the quick brown fox jumps over", 4).tolist())
    assert set(fps.tolist()) <= all_h


def test_doc_fingerprint_detects_identity_not_noise():
    a = doc_fingerprint("some document body with words")
    b = doc_fingerprint("some document body with words")
    c = doc_fingerprint("completely different content here")
    assert a == b and a != c


def test_winnow_from_hashes_equivalence():
    """winnow_fingerprints(text) must equal winnow_from_hashes over the
    same rolling hashes for every length regime (0, <=w, >w)."""
    import numpy as np

    from anycrawl_ray.functions.text import (rolling_kgram_hashes,
                                             winnow_fingerprints,
                                             winnow_from_hashes)

    for text in ("", "short", "abcdefghij", "the quick brown fox " * 40):
        h = rolling_kgram_hashes(text, 8)
        assert np.array_equal(winnow_fingerprints(text),
                              winnow_from_hashes(h))
