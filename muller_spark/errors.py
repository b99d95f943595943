"""Engine exceptions, mirroring the reference's error surface."""


class MullerSparkError(Exception):
    pass


class TensorDoesNotExistError(MullerSparkError, AttributeError, KeyError):
    """AttributeError subclass so ``hasattr``/``getattr`` protocols still
    work when probing ``ds.<tensor>`` accessors."""


class TensorAlreadyExistsError(MullerSparkError):
    pass


class MergeConflictError(MullerSparkError):
    """Raised when a 3-way merge needs a resolution argument
    (reference ``merge.py:1013-1092``)."""


class MergeMismatchError(MullerSparkError):
    """Schema/dtype mismatch between branches (reference ``merge.py:933-977``)."""


class CheckoutError(MullerSparkError):
    pass


class ReadOnlyModeError(MullerSparkError):
    pass


class VectorIndexNotFoundError(MullerSparkError, KeyError):
    """No vector index registered under (tensor, index_name) — reference
    ``muller/core/vector/exceptions.py`` IndexNotFoundError."""
