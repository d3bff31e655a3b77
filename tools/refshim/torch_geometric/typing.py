from typing import Optional, Tuple, Union

from torch import Tensor

OptTensor = Optional[Tensor]
OptPairTensor = Tuple[Tensor, OptTensor]
PairTensor = Tuple[Tensor, Tensor]
Adj = Union[Tensor, "object"]
Size = Optional[Tuple[int, int]]
