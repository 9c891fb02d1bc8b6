"""Reusable DataFrame -> DataFrame operators."""

from .validate import split_valid_invalid, reject_reason_column  # noqa: F401
from .upsert import upsert_last_writer_wins  # noqa: F401
from .asof import calendar_day_delta, with_prev_calendar_day  # noqa: F401
from .repetition import (  # noqa: F401
    doc_repetition_profile,
    filter_repetitious,
    ngram_repetition,
)
from .bpe import (  # noqa: F401
    bpe_encode,
    bpe_vocab,
    train_bpe,
    word_histogram,
)
