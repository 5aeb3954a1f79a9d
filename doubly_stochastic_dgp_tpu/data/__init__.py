from . import datasets
from .datasets import Datasets, SyntheticRegression, make_synthetic_regression
