"""Explanation extraction and quality metrics."""

from .token_coo import (
    compute_ans_token_cooccurrence,
    compute_qst_token_cooccurrence,
    compute_text_expl_token_cooccurrence,
)
from .runner import run_token_coo_exp

__all__ = [
    "compute_ans_token_cooccurrence",
    "compute_qst_token_cooccurrence",
    "compute_text_expl_token_cooccurrence",
    "run_token_coo_exp",
]
