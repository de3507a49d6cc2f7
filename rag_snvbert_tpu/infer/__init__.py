from .imputer import ImputationResult, Imputer
