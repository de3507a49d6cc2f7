from .imputer import ImputationResult, Imputer
from .serve import ImputationService
