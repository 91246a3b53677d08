"""The lognoise filters must drop EXACTLY the two cosmetic Ray-internal
records and nothing else — a real schema mismatch must still log."""

import logging

from open_thoughts_ray import lognoise

EXEC_LOGGER = "ray.data._internal.execution.streaming_executor_state"
ARROW_LOGGER = "ray.data._internal.arrow_ops.transform_pyarrow"


def _emits(logger_name: str, msg: str, level=logging.WARNING) -> bool:
    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record)

    lg = logging.getLogger(logger_name)
    h = Capture()
    lg.addHandler(h)
    old_level, old_prop = lg.level, lg.propagate
    lg.setLevel(logging.DEBUG)
    lg.propagate = False
    try:
        lg.log(level, msg)
    finally:
        lg.removeHandler(h)
        lg.setLevel(old_level)
        lg.propagate = old_prop
    return bool(records)


def test_empty_schema_refbundle_warning_dropped():
    lognoise.install()
    msg = ("Operator produced a RefBundle with a different schema than "
           "the previous one. Previous schema: a: int64, "
           "new schema: . This may lead to unexpected behavior.")
    assert not _emits(EXEC_LOGGER, msg)


def test_real_schema_mismatch_still_logs():
    lognoise.install()
    msg = ("Operator produced a RefBundle with a different schema than "
           "the previous one. Previous schema: a: int64, "
           "new schema: a: string. This may lead to unexpected behavior.")
    assert _emits(EXEC_LOGGER, msg)


def test_schema_hash_failure_dropped():
    lognoise.install()
    msg = "Failed to hash the schemas (for deduplication): unhashable type: 'dict'"
    assert not _emits(ARROW_LOGGER, msg)


def test_other_warnings_untouched():
    lognoise.install()
    assert _emits(EXEC_LOGGER, "some unrelated warning")
    assert _emits(ARROW_LOGGER, "another unrelated warning")


def test_non_warning_levels_untouched():
    lognoise.install()
    msg = "Failed to hash the schemas (for deduplication): boom"
    assert _emits(ARROW_LOGGER, msg, level=logging.ERROR)


def test_uninstall_restores_everything():
    lognoise.install()
    lognoise.uninstall()
    try:
        msg = ("Operator produced a RefBundle with a different schema than "
               "the previous one. Previous schema: a: int64, "
               "new schema: . This may lead to unexpected behavior.")
        assert _emits(EXEC_LOGGER, msg)
    finally:
        lognoise.install()


def test_install_is_idempotent():
    lognoise.install()
    lognoise.install()
    lg = logging.getLogger(EXEC_LOGGER)
    assert lg.filters.count(lognoise._FILTER) == 1
