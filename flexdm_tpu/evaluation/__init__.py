"""Per-task quantitative evaluation (reference eval.py)."""

from .harness import evaluate_all, evaluate_task, main, merge_results

__all__ = ["evaluate_all", "evaluate_task", "main", "merge_results"]
