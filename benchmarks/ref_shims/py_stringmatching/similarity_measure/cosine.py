class Cosine:
    def get_raw_score(self, set1, set2):
        s1, s2 = set(set1), set(set2)
        if not s1 and not s2:
            return 1.0
        if not s1 or not s2:
            return 0.0
        return float(len(s1 & s2)) / ((len(s1) * len(s2)) ** 0.5)

    get_sim_score = get_raw_score
