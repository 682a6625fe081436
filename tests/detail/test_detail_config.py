"""GlobalConfig / init() behavior matrix (reference analog:
`python/tests/detail/test_db_config.py:70-310`).

Semantics pinned:
- repeated init() succeeds as a NO-OP (first init's values survive),
- int knobs reject bool/float/str with TypeError; ranges raise ValueError,
- memory_limit_mb has a 100MB floor (RuntimeError, the reference's
  MIN_MEMORY_LIMIT_BYTES),
- the FILE log sink creates log_dir and writes through the zvec_tpu logger.

Each case builds a FRESH GlobalConfig instance (never the process
singleton) so the matrix can't poison other tests.
"""

import logging
import os

import pytest

from zvec_tpu.typing import LogLevel, LogType
from zvec_tpu.utils.config import GlobalConfig


def fresh(**kwargs):
    cfg = GlobalConfig()
    cfg.initialize(**kwargs)
    return cfg


class TestInitDefaults:
    def test_defaults(self):
        cfg = fresh()
        assert cfg.initialized
        assert cfg.log_type == LogType.CONSOLE
        assert cfg.log_level == LogLevel.WARN
        assert cfg.query_threads >= 1
        assert cfg.optimize_threads >= 1
        assert cfg.memory_limit_mb >= 100
        assert cfg.forward_file_format == "ipc"
        assert cfg.mesh_devices == 0

    def test_none_keeps_defaults(self):
        cfg = fresh(query_threads=None, memory_limit_mb=None, mesh_devices=None)
        assert cfg.query_threads >= 1
        assert cfg.memory_limit_mb >= 100

    def test_repeated_initialize_noop(self):
        cfg = fresh(query_threads=2)
        cfg.initialize(query_threads=9, memory_limit_mb=4096)
        assert cfg.query_threads == 2  # second call ignored entirely

    def test_repeated_initialize_invalid_values_still_noop(self):
        cfg = fresh(query_threads=2)
        # even invalid values in the ignored second call must not raise —
        # the call returns before any validation (reference: repeated init
        # is allowed unconditionally)
        cfg.initialize(query_threads=-5)
        assert cfg.query_threads == 2

    def test_unknown_key_rejected(self):
        with pytest.raises(ValueError, match="unknown config key"):
            fresh(not_a_key=1)

    def test_mixed_config(self):
        cfg = fresh(
            memory_limit_mb=128,
            query_threads=1,
            log_level=LogLevel.WARN,
            brute_force_by_keys_ratio=0.25,
        )
        assert cfg.memory_limit_mb == 128
        assert cfg.brute_force_by_keys_ratio == 0.25


class TestMemoryLimit:
    def test_min_valid(self):
        assert fresh(memory_limit_mb=100).memory_limit_mb == 100

    def test_below_floor(self):
        with pytest.raises(RuntimeError):
            fresh(memory_limit_mb=99)

    @pytest.mark.parametrize("bad", [0, -1])
    def test_nonpositive(self, bad):
        with pytest.raises(ValueError):
            fresh(memory_limit_mb=bad)

    @pytest.mark.parametrize("bad", ["512", 512.5, True])
    def test_wrong_type(self, bad):
        with pytest.raises(TypeError):
            fresh(memory_limit_mb=bad)


class TestThreads:
    @pytest.mark.parametrize("knob", ["query_threads", "optimize_threads"])
    def test_valid(self, knob):
        assert getattr(fresh(**{knob: 3}), knob) == 3

    @pytest.mark.parametrize("knob", ["query_threads", "optimize_threads"])
    @pytest.mark.parametrize("bad", [0, -1])
    def test_invalid_range(self, knob, bad):
        with pytest.raises(ValueError):
            fresh(**{knob: bad})

    @pytest.mark.parametrize("knob", ["query_threads", "optimize_threads"])
    @pytest.mark.parametrize("bad", ["2", 2.0])
    def test_invalid_type(self, knob, bad):
        with pytest.raises(TypeError):
            fresh(**{knob: bad})


class TestRatios:
    @pytest.mark.parametrize(
        "knob", ["invert_to_forward_scan_ratio", "brute_force_by_keys_ratio"]
    )
    @pytest.mark.parametrize("val", [0.0, 0.5, 1.0])
    def test_valid(self, knob, val):
        assert getattr(fresh(**{knob: val}), knob) == val

    @pytest.mark.parametrize(
        "knob", ["invert_to_forward_scan_ratio", "brute_force_by_keys_ratio"]
    )
    @pytest.mark.parametrize("bad", [-0.1, 1.5])
    def test_invalid_range(self, knob, bad):
        with pytest.raises(ValueError):
            fresh(**{knob: bad})


class TestLogging:
    @pytest.mark.parametrize("lvl", list(LogLevel))
    def test_log_level_valid(self, lvl):
        assert fresh(log_level=lvl).log_level == lvl

    def test_log_level_coerced_from_value(self):
        cfg = fresh(log_level=LogLevel.INFO.value)
        assert cfg.log_level == LogLevel.INFO

    def test_log_level_invalid(self):
        with pytest.raises(ValueError):
            fresh(log_level="not-a-level")

    @pytest.mark.parametrize("lt", list(LogType))
    def test_log_type_valid(self, lt, tmp_path):
        cfg = GlobalConfig()
        # point FILE sinks at tmp so the matrix never litters ./logs
        cfg.initialize(log_type=lt, log_dir=str(tmp_path / "logs"))
        assert cfg.log_type == lt

    def test_log_type_invalid(self):
        with pytest.raises(ValueError):
            fresh(log_type="syslog")

    @pytest.mark.parametrize("bad", [0, -1])
    def test_log_file_size_invalid(self, bad):
        with pytest.raises(ValueError):
            fresh(log_file_size=bad)

    @pytest.mark.parametrize("bad", [0, -1])
    def test_log_overdue_days_invalid(self, bad):
        with pytest.raises(ValueError):
            fresh(log_overdue_days=bad)

    @pytest.mark.parametrize("knob", ["log_file_size", "log_overdue_days"])
    def test_log_int_knobs_type(self, knob):
        with pytest.raises(TypeError):
            fresh(**{knob: "df"})

    def test_file_sink_creates_dir_and_writes(self, tmp_path):
        """FILE log type materializes log_dir and log records land in the
        file (reference `test_init_file_logger`). Uses a private logger
        namespace so the process-wide 'zvec_tpu' logger keeps its handlers."""
        log_dir = tmp_path / "logs"
        cfg = GlobalConfig()
        cfg.initialize(
            log_type=LogType.FILE,
            log_level=LogLevel.DEBUG,
            log_dir=str(log_dir),
            log_basename="zvec.log",
        )
        assert log_dir.is_dir()
        logger = logging.getLogger("zvec_tpu")
        handlers = [
            h
            for h in logger.handlers
            if getattr(h, "baseFilename", "").startswith(str(log_dir))
        ]
        if handlers:  # first FILE init in this process owns the handler
            logger.debug("detail-config file sink probe")
            handlers[0].flush()
            assert os.path.getsize(handlers[0].baseFilename) > 0

    def test_mesh_devices_negative(self):
        with pytest.raises(ValueError):
            fresh(mesh_devices=-1)

    def test_forward_format_invalid(self):
        with pytest.raises(ValueError):
            fresh(forward_file_format="orc")

    def test_forward_format_parquet_valid(self):
        assert fresh(forward_file_format="parquet").forward_file_format == "parquet"
