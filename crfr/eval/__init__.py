from crfr.eval.verification import (  # noqa: F401
    VerificationResult,
    evaluate_verification,
    fuse_flip_features,
)
from crfr.eval.identification import (  # noqa: F401
    IdentificationResult,
    closed_set_identification,
    open_set_identification,
)
from crfr.eval.bank import (  # noqa: F401
    QuantBank,
    load_bank,
    quantize_bank,
    save_bank,
)
