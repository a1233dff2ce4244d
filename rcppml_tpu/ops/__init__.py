from .linalg import gram, rhs, extract_scaling, gram_trick_loss
from .solvers import cholesky_clip_batch, cd_nnls_batch
