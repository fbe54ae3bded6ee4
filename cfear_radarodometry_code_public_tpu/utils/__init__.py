from cfear_radarodometry_code_public_tpu.utils import se2  # noqa: F401
from cfear_radarodometry_code_public_tpu.utils.stats import timing  # noqa: F401
