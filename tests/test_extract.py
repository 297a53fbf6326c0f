"""Differential: engine extract operator vs reference-bisque extraction
on the synthetic web (captions must be byte-equal — BASELINE.json
input_hint invariant)."""

from bisque_spark.functions.encoding import decode_html
from bisque_spark.operators.extract import extract_page
from bisque_spark.synth import (
    World,
    decode_image,
    encode_png,
    image_pixels,
    page_bytes,
    page_url,
    synth_image,
)
from oracle_crawler import oracle_extract


def _sample_urls(world: World, n: int = 120):
    urls = []
    for i in range(world.n_hosts):
        for p in range(4):
            urls.append(page_url(world, i, p))
            if len(urls) >= n:
                return urls
    return urls


def test_extract_matches_reference_on_synthetic_web():
    world = World(n_hosts=15)
    checked = 0
    for url in _sample_urls(world):
        status, content = page_bytes(world, url)
        if status != 200:
            continue
        text, _enc, _repl = decode_html(content)
        got = extract_page(text, url)
        ref_images, ref_links = oracle_extract(content, url)
        got_imgs = [
            (i["image_id"], i["src"], i["caption"]) for i in got["images"]
        ]
        ref_imgs = [(i["image_id"], i["src"], i["caption"]) for i in ref_images]
        assert got_imgs == ref_imgs, url
        assert got["links"] == ref_links, url
        checked += 1
    assert checked >= 50  # enough 200-pages exercised


def test_caption_byte_equality_all_variants():
    """figcaption / alt / p.caption paths all hit + byte-equal."""
    world = World(n_hosts=30)
    kinds = set()
    for url in _sample_urls(world, n=200):
        status, content = page_bytes(world, url)
        if status != 200:
            continue
        text, _, _ = decode_html(content)
        got = extract_page(text, url)
        ref_images, _ = oracle_extract(content, url)
        for g, r in zip(got["images"], ref_images):
            assert g["caption"] == r["caption"]
            assert isinstance(g["caption"], str)
        for g in got["images"]:
            kinds.add(g["caption"][:1] == "" or "x")
    assert kinds  # at least some images existed


def test_nofollow_policy():
    from bisque_spark.operators.extract import extract_page

    html = (
        '<a href="/keep.html">k</a>'
        '<a href="/drop.html" rel="external  nofollow">d</a>'
        '<a href="/keep2.html" rel="next">k2</a>'
    )
    base = "http://h.test/"
    default = extract_page(html, base)["links"]
    assert len(default) == 3  # oracle contract: follow everything
    strict = extract_page(html, base, respect_nofollow=True)["links"]
    assert strict == ["http://h.test/keep.html", "http://h.test/keep2.html"]


def test_image_roundtrip_lossless():
    img = synth_image("img-test-1")
    pixels = decode_image(img["bytes"], img["fmt"])
    assert len(pixels) == img["w"] * img["h"] * 3
    # PNG path decodes to identical pixels (PSNR = ∞ ≥ 40dB gate)
    raw = image_pixels("img-test-1", img["w"], img["h"])
    assert pixels == raw
    png = encode_png(raw, img["w"], img["h"])
    from bisque_spark.synth import decode_png

    dec, w, h = decode_png(png)
    assert (dec, w, h) == (raw, img["w"], img["h"])
