from llp_tpu.serve.engine import (  # noqa: F401
    encode_nodes,
    load_serving_artifacts,
    score_pairs,
    top_k_partners,
)
from llp_tpu.serve.quant import (  # noqa: F401
    QuantTable,
    quantize_table,
)
from llp_tpu.serve.server import (  # noqa: F401
    BackgroundServer,
    ServingState,
    serve_forever,
)
