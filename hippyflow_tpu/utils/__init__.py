from .parameter_list import ParameterList
from .prandom import KeyChain
from .mv_utilities import mv_to_dense, dense_to_mv_local, mv_to_dense_local
