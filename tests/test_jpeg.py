"""Baseline JPEG codec (raster/jpeg.py) + JPEG-in-TIFF (Compression=7).

The reference accepts JPEG-compressed GeoTIFF tiles through ImageIO /
GeoTools readers (GeoWaveRasterReader); here the codec is first-party
numpy.  The PSNR≥40dB lossy-format invariant is the BASELINE.json
input_hint per-row rule.
"""

from __future__ import annotations

import numpy as np
import pytest

from geowave_spark.raster.codec import decode_image, encode_image, psnr
from geowave_spark.raster.jpeg import decode_jpeg, encode_jpeg, split_tables
from geowave_spark.sources.images import gen_pixels


class TestRoundTrip:
    @pytest.mark.parametrize("hw", [(16, 16), (64, 64), (256, 256), (40, 72), (17, 33)])
    def test_psnr_at_q90(self, hw):
        h, w = hw
        px = gen_pixels(7, w, h)
        back = decode_jpeg(encode_jpeg(px, quality=90))
        assert back.shape == px.shape
        assert psnr(px, back) >= 40.0

    def test_grayscale(self):
        g = gen_pixels(3, 32, 32)[:, :, :1]
        back = decode_jpeg(encode_jpeg(g, quality=95))
        assert back.shape == (32, 32, 3)
        assert psnr(np.repeat(g, 3, axis=2), back) >= 45.0

    def test_quality_monotone(self):
        px = gen_pixels(11, 64, 64)
        ps = [psnr(px, decode_jpeg(encode_jpeg(px, q))) for q in (50, 75, 90, 100)]
        assert ps == sorted(ps)
        assert ps[-1] > 50.0

    def test_420_subsampling_smooth_content(self):
        # smooth chroma: 4:2:0 with triangular upsampling stays ≥40 dB
        yy, xx = np.mgrid[0:33, 0:47].astype(float)
        px = np.stack([xx * 4, yy * 6, 255 - xx * 3], -1).clip(0, 255).astype(np.uint8)
        d = encode_jpeg(px, 90, subsampling="420")
        assert psnr(px, decode_jpeg(d)) >= 40.0
        # and is genuinely smaller than 4:4:4
        assert len(d) < len(encode_jpeg(px, 90, subsampling="444"))

    @pytest.mark.parametrize("sub", ["444", "420"])
    def test_restart_intervals(self, sub):
        px = gen_pixels(5, 100, 60)
        plain = decode_jpeg(encode_jpeg(px, 90, sub, restart_interval=0))
        rst = decode_jpeg(encode_jpeg(px, 90, sub, restart_interval=3))
        # restart markers change the byte stream but not the pixels
        assert np.array_equal(plain, rst)

    def test_deterministic(self):
        px = gen_pixels(9, 48, 48)
        assert encode_jpeg(px, 90) == encode_jpeg(px, 90)

    def test_fill_bytes_before_markers(self):
        # T.81 B.1.1.2 allows optional 0xFF fill bytes before any marker;
        # a padded restart (FF FF D0) must not truncate the scan, and a
        # padded header marker must still parse (r4 review)
        px = gen_pixels(5, 100, 60)
        d = encode_jpeg(px, 90, restart_interval=3)
        want = decode_jpeg(d)
        sos = d.index(b"\xff\xda")
        first_rst = d.index(b"\xff\xd0", sos)
        padded = d[:first_rst] + b"\xff" + d[first_rst:]
        assert np.array_equal(decode_jpeg(padded), want)
        # fill byte in the header section, before SOF
        sof = d.index(b"\xff\xc0")
        padded_hdr = d[:sof] + b"\xff\xff" + d[sof:]
        assert np.array_equal(decode_jpeg(padded_hdr), want)

    def test_progressive_rejected(self):
        px = gen_pixels(1, 16, 16)
        d = bytearray(encode_jpeg(px, 90))
        i = d.find(b"\xff\xc0")
        d[i + 1] = 0xC2  # flip SOF0 → SOF2
        with pytest.raises(ValueError, match="progressive"):
            decode_jpeg(bytes(d))


class TestAbbreviatedStreams:
    def test_split_tables_round_trip(self):
        px = gen_pixels(4, 40, 24)
        full = encode_jpeg(px, 90)
        tables, image = split_tables(full)
        # the image stream alone has no Huffman tables
        with pytest.raises(ValueError):
            decode_jpeg(image)
        back = decode_jpeg(image, tables=tables)
        assert np.array_equal(back, decode_jpeg(full))

    def test_tables_reusable_across_tiles(self):
        tables = None
        imgs = []
        for i in range(3):
            full = encode_jpeg(gen_pixels(i, 32, 32), 90)
            t, im = split_tables(full)
            tables = tables or t
            imgs.append(im)
        for i, im in enumerate(imgs):
            assert psnr(gen_pixels(i, 32, 32), decode_jpeg(im, tables=tables)) >= 40.0


class TestCodecDispatch:
    def test_decode_image_sniffs_real_jpeg(self):
        px = gen_pixels(13, 32, 32)
        real = encode_jpeg(px, 95)
        out = decode_image(real, "jpeg")  # fmt says jpeg, bytes are JFIF
        assert psnr(px, out) >= 40.0
        # fixture stand-in still decodes through the PNG container
        stub = encode_image(px, "jpeg")
        assert psnr(px, decode_image(stub, "jpeg")) >= 40.0

    def test_jfif_codec_name(self):
        px = gen_pixels(2, 24, 24)
        assert psnr(px, decode_image(encode_image(px, "jfif"), "jfif")) >= 40.0


class TestJpegInTiff:
    def test_strip_round_trip(self, tmp_path):
        from geowave_spark.sources.geotiff import parse_geotiff, write_geotiff

        px = gen_pixels(21, 80, 50)
        p = str(tmp_path / "j.tif")
        write_geotiff(p, px, origin=(5.0, 45.0), res=0.01, compression="jpeg")
        arr, meta = parse_geotiff(open(p, "rb").read())
        assert arr.shape == (50, 80, 3)
        assert psnr(px, arr) >= 40.0
        assert meta["pixel_scale"][0] == 0.01

    def test_tiled_abbreviated_with_jpegtables(self, tmp_path):
        from geowave_spark.sources.geotiff import parse_geotiff, write_geotiff

        px = gen_pixels(22, 70, 40)
        p = str(tmp_path / "jt.tif")
        write_geotiff(p, px, origin=(0.0, 0.0), res=0.1, compression="jpeg", tile_size=32)
        raw = open(p, "rb").read()
        arr, _ = parse_geotiff(raw)
        assert arr.shape == (40, 70, 3)
        assert psnr(px, arr) >= 40.0
        # the shared tables really were factored out: tag 347 present and
        # each tile stream lacks a DHT of its own
        assert b"JFIF" in raw

    def test_gray_jpeg_tiff(self, tmp_path):
        from geowave_spark.sources.geotiff import parse_geotiff, write_geotiff

        g = gen_pixels(8, 48, 48)[:, :, :1].copy()
        p = str(tmp_path / "g.tif")
        write_geotiff(p, g, origin=(0.0, 0.0), res=1.0, compression="jpeg")
        arr, _ = parse_geotiff(open(p, "rb").read())
        assert arr.shape == (48, 48, 1)
        assert psnr(g, arr) >= 45.0

    def test_old_style_jpeg_rejected(self, tmp_path):
        from geowave_spark.sources.geotiff import parse_geotiff, write_geotiff

        px = gen_pixels(1, 16, 16)
        p = str(tmp_path / "o.tif")
        write_geotiff(p, px, origin=(0.0, 0.0), res=1.0)
        raw = bytearray(open(p, "rb").read())
        # flip Compression (tag 259) value 1 → 6 in the IFD
        i = raw.find(bytes.fromhex("03010300 01000000 01000000".replace(" ", "")))
        raw[i + 8] = 6
        with pytest.raises(ValueError, match="old-style"):
            parse_geotiff(bytes(raw))


class TestDctInternals:
    def test_dct_matrix_orthonormal(self):
        from geowave_spark.raster.jpeg import _C

        assert np.allclose(_C @ _C.T, np.eye(8), atol=1e-12)

    def test_zigzag_is_permutation(self):
        from geowave_spark.raster.jpeg import _ZZ_FLAT

        assert sorted(_ZZ_FLAT.tolist()) == list(range(64))
        # the canonical start of the zigzag scan
        assert _ZZ_FLAT[:6].tolist() == [0, 1, 8, 16, 9, 2]

    def test_mag_bits(self):
        from geowave_spark.raster.jpeg import _extend, _mag_bits

        for v in (-255, -128, -1, 0, 1, 2, 127, 1023):
            size, bits = _mag_bits(v)
            assert _extend(bits, size) == v
