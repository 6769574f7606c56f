class Levenshtein:
    def get_raw_score(self, string1, string2):
        m, n = len(string1), len(string2)
        if m == 0:
            return n
        if n == 0:
            return m
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            c1 = string1[i - 1]
            for j in range(1, n + 1):
                cost = 0 if c1 == string2[j - 1] else 1
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            prev = cur
        return prev[n]

    get_sim_score = get_raw_score
