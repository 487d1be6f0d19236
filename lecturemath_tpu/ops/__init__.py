from .cc_label import label_components, label_components_batch, compact_labels
from .overlap import candidate_pairs, pairwise_overlap
