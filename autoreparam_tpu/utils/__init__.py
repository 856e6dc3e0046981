from .results import load_results, result_filename, save_result
