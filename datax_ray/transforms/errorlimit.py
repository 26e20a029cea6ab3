"""Error budget — the ErrorRecordChecker contract.

Reference: core/.../util/ErrorRecordChecker.java:18-82, checked after the
run (JobContainer.java:962-966). Precedence rule reproduced exactly: the
absolute record limit is checked FIRST; the percentage limit second.
``record=0`` means any dirty record fails the job (the self-check job ships
with errorLimit{record: 0, percentage: 0.02}, core/src/main/job/job.json).
"""

from __future__ import annotations

from dataclasses import dataclass


class ErrorLimitExceeded(RuntimeError):
    pass


@dataclass
class ErrorLimit:
    record: int | None = None        # max absolute dirty records
    percentage: float | None = None  # max dirty / total ratio

    def check(self, dirty: int, total: int) -> None:
        if self.record is not None and dirty > self.record:
            raise ErrorLimitExceeded(
                f"dirty records {dirty} exceeds limit {self.record}"
            )
        if self.percentage is not None and total > 0:
            ratio = dirty / total
            if ratio > self.percentage:
                raise ErrorLimitExceeded(
                    f"dirty ratio {ratio:.4f} exceeds limit {self.percentage}"
                )
