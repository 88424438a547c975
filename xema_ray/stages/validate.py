"""placeholder — replaced by the real dataset validator stage"""
class ValidationResult:  # pragma: no cover
    pass
def validate_dataset(*a, **k):  # pragma: no cover
    raise NotImplementedError
