"""Entity write-path validation — the reference's rejection tables.

Pure-Python rules ported from internal/geocube/: urn.go:31-38,
record.go:174-214, variable.go:286-328, dataset.go:191-220,
dataformat.go:53-93, consolidation_params.go:36-150 (its ginkgo table,
consolidation_params_test.go, is ported verbatim below), layout.go:116-132,
grid.go:79-102, palette.go:54-72.
"""

from __future__ import annotations

import math

import pytest

from geocube_spark.functions.palette import ColorPoint
from geocube_spark.validation import (
    ValidationError,
    is_valid_urn,
    validate_aoi_bounds,
    validate_consolidation_params,
    validate_dataset_with_variable,
    validate_dformat,
    validate_dmapping,
    validate_grid,
    validate_instance_name,
    validate_layout,
    validate_named_palette,
    validate_record,
    validate_variable,
)

DF = {
    "dtype": "Int16", "no_data": -32768.0, "min_value": 0.0, "max_value": 10000.0,
}
DM = {**DF, "real_min_value": 0.0, "real_max_value": 1.0, "exponent": 1.0}


class TestURN:
    @pytest.mark.parametrize(
        "s", ["a", "A-b:c_1", "seg1/seg2", "S2A_MSIL1C/t:31", "0/1/2", "x" * 100]
    )
    def test_valid(self, s):
        assert is_valid_urn(s)

    @pytest.mark.parametrize(
        "s", ["", "a b", "a.b", "/a", "a/", "a//b", "é", "a*b", "a?b", "a\n"]
    )
    def test_invalid(self, s):
        assert not is_valid_urn(s)


class TestRecord:
    def test_multi_segment_name_ok(self):
        validate_record("mission/pass/2020", {"k": "v"})

    @pytest.mark.parametrize("tags", [{"k*": "v"}, {"k": "v?"}, {"a?b": ""}])
    def test_glob_chars_in_tags_rejected(self, tags):
        # record.go:189-196: tags may not contain '*' or '?'
        with pytest.raises(ValidationError, match="Tag"):
            validate_record("ok", tags)

    def test_aoi_bounds(self):
        validate_aoi_bounds((-180.0, -90.0, 180.0, 90.0))
        with pytest.raises(ValidationError, match="geographic"):
            validate_aoi_bounds((-181.0, 0.0, 0.0, 1.0))
        with pytest.raises(ValidationError, match="geographic"):
            validate_aoi_bounds((0.0, 0.0, 1.0, 91.0))
        with pytest.raises(ValidationError, match="empty"):
            validate_aoi_bounds((1.0, 0.0, 0.0, 1.0))


class TestDFormat:
    def test_ok(self):
        validate_dformat(DF)
        validate_dmapping(DM)

    def test_range_outside_dtype_bounds(self):
        # dataformat.go:80-82: Int16 cannot hold 40000
        with pytest.raises(ValidationError, match="out of bounds"):
            validate_dformat({**DF, "max_value": 40000.0})

    def test_min_not_below_max(self):
        with pytest.raises(ValidationError, match="strictly lower"):
            validate_dformat({**DF, "min_value": 10000.0})

    def test_nodata_outside_dtype(self):
        # dataformat.go:88-90 (UInt8 cannot hold -1)
        with pytest.raises(ValidationError, match="noData"):
            validate_dformat(
                {"dtype": "UInt8", "no_data": -1.0, "min_value": 1.0, "max_value": 255.0}
            )

    def test_nan_nodata_means_undefined(self):
        validate_dformat({**DF, "no_data": float("nan")})

    def test_exponent_positive(self):
        for bad in (0.0, -1.0):
            with pytest.raises(ValidationError, match="exponent"):
                validate_dmapping({**DM, "exponent": bad})

    def test_external_range(self):
        with pytest.raises(ValidationError, match="strictly lower"):
            validate_dmapping({**DM, "real_min_value": 1.0, "real_max_value": 1.0})


class TestVariable:
    def test_ok(self):
        validate_variable("NDVI", ["B1"], DF)
        validate_variable("RGB", ["R", "G", "B"], DF)

    def test_bad_name(self):
        with pytest.raises(ValidationError, match="Incorrect name"):
            validate_variable("bad name", ["B1"], DF)

    def test_palette_requires_single_band(self):
        # variable.go:309-311
        validate_variable("NDVI", ["B1"], DF, palette="viridis")
        with pytest.raises(ValidationError, match="multi-bands"):
            validate_variable("RGB", ["R", "G"], DF, palette="viridis")

    def test_palette_name_is_urn(self):
        with pytest.raises(ValidationError, match="palette name"):
            validate_variable("NDVI", ["B1"], DF, palette="bad palette")

    def test_bands(self):
        with pytest.raises(ValidationError, match="at least one band"):
            validate_variable("NDVI", [], DF)
        with pytest.raises(ValidationError, match="Band name"):
            validate_variable("X", ["R", ""], DF)
        # single unnamed band is allowed (variable.go:320: only >1 checked)
        validate_variable("X", [""], DF)

    def test_instance_name_single_segment(self):
        validate_instance_name("inst-1:a_b")
        with pytest.raises(ValidationError):
            validate_instance_name("a/b")  # '/' only valid in full URNs
        with pytest.raises(ValidationError):
            validate_instance_name("")


class TestDatasetWithVariable:
    VAR = {"bands": ["B1"], "dformat": DF}

    def test_ok(self):
        validate_dataset_with_variable([1], DM, self.VAR)

    def test_band_arity(self):
        with pytest.raises(ValidationError, match="number of bands"):
            validate_dataset_with_variable([1, 2], DM, self.VAR)

    def test_cast_lattice(self):
        # datatype.go:43-58: complex never casts to real
        with pytest.raises(ValidationError, match="cannot be cast"):
            validate_dataset_with_variable([1], {**DM, "dtype": "Complex64"}, self.VAR)

    def test_external_range_must_intersect(self):
        # dataset.go:200-204: dataset ve-range vs variable value range
        with pytest.raises(ValidationError, match="does not intersect"):
            validate_dataset_with_variable(
                [1],
                {**DM, "real_min_value": 20000.0, "real_max_value": 30000.0},
                self.VAR,
            )


class TestConsolidationParams:
    """consolidation_params_test.go ported: each context becomes a case;
    the expected NORMALIZED creation params are the reference's merged
    tables."""

    def test_compression_no(self):
        assert validate_consolidation_params("Float32", "NO") == {}

    def test_lossless_float32(self):
        assert validate_consolidation_params("Float32", "LOSSLESS") == {
            "COMPRESS": "ZSTD", "COMPRESS_OVERVIEW": "ZSTD",
            "PREDICTOR": "2", "PREDICTOR_OVERVIEW": "2",
            "ZSTD_LEVEL": "0.01", "ZSTD_LEVEL_OVERVIEW": "0.01",
        }

    def test_lossy_float32_merges_over_user_compress(self):
        # user COMPRESS=JPEG is OVERWRITTEN by LERC, JPEG_QUALITY survives
        got = validate_consolidation_params(
            "Float32", "LOSSY", {"COMPRESS": "JPEG", "JPEG_QUALITY": "2"}
        )
        assert got == {
            "COMPRESS": "LERC", "COMPRESS_OVERVIEW": "LERC",
            "MAX_Z_ERROR": "0.01", "MAX_Z_ERROR_OVERVIEW": "0.01",
            "JPEG_QUALITY": "2",
        }

    def test_lossless_float64_uses_lerc_zstd(self):
        assert validate_consolidation_params("Float64", "LOSSLESS") == {
            "COMPRESS": "LERC_ZSTD", "COMPRESS_OVERVIEW": "LERC_ZSTD",
            "MAX_Z_ERROR": "0", "MAX_Z_ERROR_OVERVIEW": "0",
        }

    def test_lossy_complex_rejected(self):
        with pytest.raises(
            ValidationError,
            match=r"compressionOption LOSSY not supported for data type Complex64",
        ):
            validate_consolidation_params("Complex64", "LOSSY")

    def test_custom_jpeg_float32_rejected(self):
        with pytest.raises(
            ValidationError,
            match=r"compressionOption JPEG not supported for data type Float32",
        ):
            validate_consolidation_params("Float32", "CUSTOM", {"COMPRESS": "JPEG"})

    def test_custom_jpeg_uint8_ok(self):
        got = validate_consolidation_params("UInt8", "CUSTOM", {"COMPRESS": "JPEG"})
        assert got == {"COMPRESS": "JPEG"}

    def test_custom_without_compress(self):
        with pytest.raises(ValidationError, match="COMPRESS is not defined"):
            validate_consolidation_params("UInt8", "CUSTOM", {})

    def test_unknown_creation_param(self):
        with pytest.raises(ValidationError, match="unknown creationParams"):
            validate_consolidation_params("UInt8", "NO", {"BLOCKSIZE": "512"})

    def test_undefined_resampling(self):
        with pytest.raises(ValidationError, match="Resampling"):
            validate_consolidation_params("UInt8", "NO", None, "UNDEFINED")


class TestLayout:
    OK = dict(
        name="L1", block_x_size=256, block_y_size=256, max_records=1024,
        interlacing_pattern="Z=0>T>R>B;Z=1:>R>T>B",
    )

    def test_ok(self):
        validate_layout(**self.OK)

    def test_bad_name(self):
        with pytest.raises(ValidationError, match="invalid name"):
            validate_layout(**{**self.OK, "name": "bad name"})
        validate_layout(**{**self.OK, "name": "bad name"}, ignore_name=True)

    @pytest.mark.parametrize("patch", [
        {"block_x_size": 0}, {"block_y_size": -1}, {"max_records": 0},
    ])
    def test_positive_sizes(self, patch):
        with pytest.raises(ValidationError, match="positive"):
            validate_layout(**{**self.OK, **patch})

    def test_interlacing_must_parse(self):
        with pytest.raises(ValidationError, match="InterlacingPattern"):
            validate_layout(**{**self.OK, "interlacing_pattern": "Z>T>R"})
        with pytest.raises(ValidationError, match="InterlacingPattern"):
            validate_layout(**{**self.OK, "interlacing_pattern": "Q>Z>T>R>B"})


class TestGrid:
    CELLS = [{"id": "31TCJ"}, {"id": "31TDJ"}]

    def test_ok(self):
        validate_grid("mgrs", self.CELLS)

    def test_reserved_names(self):
        # abstractgrid.go:24
        for n in ("regular", "Regular", "SINGLECELL"):
            with pytest.raises(ValidationError, match="reserved"):
                validate_grid(n, self.CELLS)

    def test_name_single_segment(self):
        with pytest.raises(ValidationError, match="invalid name"):
            validate_grid("a/b", self.CELLS)

    def test_cell_ids(self):
        with pytest.raises(ValidationError, match="invalid cell-id"):
            validate_grid("g", [{"id": "bad id"}])
        with pytest.raises(ValidationError, match="Duplicate"):
            validate_grid("g", [{"id": "A"}, {"id": "A"}])


class TestPalette:
    PTS = [ColorPoint(0.0, 0, 0, 0, 255), ColorPoint(1.0, 255, 255, 255, 255)]

    def test_ok(self):
        validate_named_palette("viridis", self.PTS)

    def test_bad_name(self):
        with pytest.raises(ValidationError, match="Palette Name"):
            validate_named_palette("bad name", self.PTS)

    def test_point_rules_delegated(self):
        with pytest.raises(ValidationError, match="Palette Points"):
            validate_named_palette("p", [ColorPoint(0.0, 0, 0, 0, 255)])
        with pytest.raises(ValidationError, match="Palette Points"):
            validate_named_palette(
                "p", [ColorPoint(0.1, 0, 0, 0, 255), ColorPoint(1.0, 0, 0, 0, 255)]
            )

    def test_reference_table(self):
        """palette_test.go TestPalette, the full mutation sequence: wrong
        name, no points, a valid 3-point ramp, then each way a point list
        can break the exactly-[0,1] strictly-increasing contract."""

        def ramp(vals):
            cols = {0.0: (0, 0, 0), 0.5: (127, 0, 0), 1.0: (255, 0, 0)}
            return [
                ColorPoint(v, *cols.get(v, (0, 0, 0)), 1) for v in vals
            ]

        with pytest.raises(ValidationError):  # 'wrong name' does not fail
            validate_named_palette("wrong name", ramp([0.0, 0.5, 1.0]))
        with pytest.raises(ValidationError):  # 'no_points' does not fail
            validate_named_palette("no_points", [])
        validate_named_palette("test", ramp([0.0, 0.5, 1.0]))  # valid
        with pytest.raises(ValidationError):  # first point moved off 0
            validate_named_palette("test", ramp([0.1, 0.5, 1.0]))
        with pytest.raises(ValidationError):  # last point moved off 1
            validate_named_palette("test", ramp([0.0, 0.5, 0.9]))
        with pytest.raises(ValidationError):  # appended 0.5 -> not increasing
            validate_named_palette("test", ramp([0.0, 0.5, 1.0, 0.5]))
        with pytest.raises(ValidationError):  # trailing duplicate 1.0
            validate_named_palette("test", ramp([0.0, 0.5, 1.0, 1.0]))
        with pytest.raises(ValidationError):  # interior duplicate 0.5
            validate_named_palette("test", ramp([0.0, 0.5, 0.5, 1.0]))


def test_nan_nodata_roundtrip_is_not_equal():
    # guard the NaN-compare subtlety: NaN != NaN, the validators must use
    # isnan, not ==
    assert math.isnan(float("nan"))
    validate_dformat({**DF, "no_data": float("nan")})
