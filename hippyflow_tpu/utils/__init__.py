from .parameter_list import ParameterList
from .prandom import KeyChain
from .mv_utilities import mv_to_dense, dense_to_mv_local, mv_to_dense_local
from .mesh_utils import save_mesh, load_mesh
from .profiling import PhaseTimer, trace, annotate
from .plotting import (
    spectrum_plot,
    generic_semilogy_plot,
    plot_accs_vs_data,
    plot_singular_values_with_std,
    subspace_angle_video,
    plot,
    plot_pts,
    plot_eigenvector,
)
