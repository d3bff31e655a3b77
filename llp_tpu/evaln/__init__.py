from llp_tpu.evaln.transductive import make_transductive_eval_fn
from llp_tpu.evaln.production import make_production_eval_fn
from llp_tpu.evaln.logger import RunLogger, ProductionRunLogger

__all__ = [
    "make_transductive_eval_fn",
    "make_production_eval_fn",
    "RunLogger",
    "ProductionRunLogger",
]
