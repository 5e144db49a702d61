"""Metric model: a computed value or a captured failure.

Mirrors the reference's metric semantics (``hooqu/metrics.py:8-39``): every
analyzer produces a ``DoubleMetric`` whose payload is a success/failure
container (the reference uses the ``tryingsnake`` Try monad; we ship a tiny
equivalent so the engine has zero exotic dependencies).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import Any, Mapping, Optional, Union


class Entity(Enum):
    """What a metric is recorded against (reference: hooqu/metrics.py:8-11)."""

    DATASET = 0
    COLUMN = 1
    MULTICOLUMN = 2


class TryValue:
    """Minimal Success/Failure container, API-compatible with the subset of
    ``tryingsnake.Try_`` the reference exercises (.get / .isSuccess /
    .isFailure / .failed / .getOrElse).
    """

    __slots__ = ()

    @property
    def isSuccess(self) -> bool:  # noqa: N802 - reference-compatible name
        return isinstance(self, Success)

    @property
    def isFailure(self) -> bool:  # noqa: N802
        return isinstance(self, Failure)


class Success(TryValue):
    __slots__ = ("_value",)

    def __init__(self, value: Any):
        self._value = value

    def get(self) -> Any:
        return self._value

    def getOrElse(self, default: Any) -> Any:  # noqa: N802
        return self._value

    def failed(self) -> "Failure":
        raise TypeError("Success.failed() on a Success value")

    def __eq__(self, other: Any) -> bool:
        return isinstance(other, Success) and bool(self._value == other._value)

    def __hash__(self) -> int:
        return hash(("Success", self._value))

    def __repr__(self) -> str:
        return f"Success({self._value!r})"


class Failure(TryValue):
    __slots__ = ("_exception",)

    def __init__(self, exception: BaseException):
        self._exception = exception

    def get(self) -> Any:
        raise self._exception

    def getOrElse(self, default: Any) -> Any:  # noqa: N802
        return default

    def failed(self) -> "Success":
        # .failed().get() yields the exception itself, as in tryingsnake.
        return Success(self._exception)

    def __eq__(self, other: Any) -> bool:
        # Two failures compare equal when they carry the same exception type +
        # message; useful for tests, never used by the engine itself.
        return (
            isinstance(other, Failure)
            and type(self._exception) is type(other._exception)
            and str(self._exception) == str(other._exception)
        )

    def __hash__(self) -> int:
        return hash(("Failure", type(self._exception), str(self._exception)))

    def __repr__(self) -> str:
        return f"Failure({self._exception!r})"


@dataclass(frozen=True)
class DoubleMetric:
    """(entity, name, instance, value) — reference hooqu/metrics.py:17-39."""

    entity: Entity
    name: str
    instance: str
    value: TryValue

    def asdict(self) -> Mapping[str, Union[str, Optional[float]]]:
        return {
            "entity": self.entity.name,
            "instance": self.instance,
            "name": self.name,
            "value": self.value.getOrElse(None),
        }


def metric_from_value(value: float, name: str, instance: str, entity: Entity) -> DoubleMetric:
    return DoubleMetric(entity, name, instance, Success(value))


def metric_from_failure(ex: BaseException, name: str, instance: str, entity: Entity) -> DoubleMetric:
    return DoubleMetric(entity, name, instance, Failure(ex))


class MetricCalculationException(Exception):
    pass


class EmptyStateException(MetricCalculationException):
    pass


def metric_from_empty(name: str, instance: str, entity: Entity) -> DoubleMetric:
    ex = EmptyStateException(
        f"Empty state for analyzer {name}({instance}), all input values were None."
    )
    return metric_from_failure(ex, name, instance, entity)
