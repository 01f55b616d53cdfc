"""TPU-native compute ops: pyramid resampling, HOG, part-filter
responses, generalized distance transforms, tree dynamic programming,
and NMS."""

from . import reference  # NumPy semantic spec / golden implementation
from .resize import resize_matrix, reduce_matrix, resize_image, reduce_image
from .hog import hog_features
from .distance_transform import distance_transform_2d, shift_distance_transform_2d
from .conv import filter_responses, filter_responses_fft
